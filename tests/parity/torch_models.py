"""Minimal torch backbones with torchvision-compatible state_dict keys.

torchvision is not installed in this environment (SURVEY.md §0), so these
serve as the torch-side reference for weight-import parity tests: same
architectures, same key names (``layer1.0.conv1.weight``,
``features.0.weight``...), so a real torchvision checkpoint would import
identically.
"""
import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TruncatedResNet(nn.Module):
    """torchvision-style ResNet without avgpool/fc (feature-map output)."""

    def __init__(self, layers=(3, 4, 6, 3), block=Bottleneck):
        super().__init__()
        self.block = block
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        out_ch = planes * self.block.expansion
        downsample = None
        if stride != 1 or self.inplanes != out_ch:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )
        layers = [self.block(self.inplanes, planes, stride, downsample)]
        self.inplanes = out_ch
        layers += [self.block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class TruncatedVGG16(nn.Module):
    """torchvision-style VGG16 ``features`` truncated after conv5_3 ReLU."""

    CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512)

    def __init__(self):
        super().__init__()
        layers, in_ch = [], 3
        for v in self.CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = v
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


class _ViTEncoderBlock(nn.Module):
    """torchvision EncoderBlock: pre-LN MHSA + MLP with residuals."""

    def __init__(self, d, heads, mlp_dim):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d, eps=1e-6)
        # torchvision MLPBlock: Sequential(Linear, GELU, Dropout, Linear,
        # Dropout) -> state_dict keys mlp.0 / mlp.3
        self.mlp = nn.Sequential(
            nn.Linear(d, mlp_dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(mlp_dim, d), nn.Dropout(0.0))

    def forward(self, x):
        y = self.ln_1(x)
        x = x + self.self_attention(y, y, y, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


class _ViTEncoder(nn.Module):
    def __init__(self, seq_len, d, layers, heads, mlp_dim):
        super().__init__()
        self.pos_embedding = nn.Parameter(torch.randn(1, seq_len, d) * 0.02)
        import collections
        self.layers = nn.Sequential(collections.OrderedDict(
            (f"encoder_layer_{i}", _ViTEncoderBlock(d, heads, mlp_dim))
            for i in range(layers)))
        self.ln = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class TruncatedViT(nn.Module):
    """torchvision-style VisionTransformer without the classifier head:
    same state_dict keys (``conv_proj``, ``class_token``,
    ``encoder.layers.encoder_layer_{i}.self_attention.in_proj_weight``...),
    output = patch-token grid [B, gh, gw, D] after the final encoder LN."""

    def __init__(self, image_size=32, patch_size=8, hidden_dim=64,
                 num_layers=2, num_heads=4, mlp_dim=128):
        super().__init__()
        self.patch_size = patch_size
        self.conv_proj = nn.Conv2d(3, hidden_dim, patch_size,
                                   stride=patch_size)
        self.class_token = nn.Parameter(torch.randn(1, 1, hidden_dim) * 0.02)
        seq_len = (image_size // patch_size) ** 2 + 1
        self.encoder = _ViTEncoder(seq_len, hidden_dim, num_layers,
                                   num_heads, mlp_dim)

    def forward(self, x):
        b = x.shape[0]
        x = self.conv_proj(x)                       # [B, D, gh, gw]
        gh, gw = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)            # [B, N, D]
        cls = self.class_token.expand(b, -1, -1)
        x = self.encoder(torch.cat([cls, x], dim=1))
        return x[:, 1:].reshape(b, gh, gw, -1)      # NHWC patch grid


def randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so parity tests catch
    mean/var import bugs (fresh BN has mean=0, var=1 which would mask them)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) * 2 + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)
    return model
