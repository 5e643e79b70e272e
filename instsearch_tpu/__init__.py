"""instsearch_tpu — TPU-native image instance retrieval framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``maxgreat/Instance-Search`` (see SURVEY.md): CNN backbones (ResNet/VGG),
MAC/R-MAC/GeM descriptor pooling, PCA-whitening, brute-force cosine top-k
search as a fused Pallas matmul+top-k kernel over an HBM-resident sharded
index, alpha-query-expansion, regional re-ranking, and the Oxford/Paris
(+revisited) evaluation protocol.
"""

__version__ = "0.1.0"

from .config import (
    EvalConfig,
    ExtractConfig,
    IndexConfig,
    PipelineConfig,
    SearchConfig,
    TrainConfig,
)

__all__ = [
    "ExtractConfig", "IndexConfig", "SearchConfig", "EvalConfig",
    "TrainConfig", "PipelineConfig", "Index", "__version__",
]


def __getattr__(name):
    # lazy: `from instsearch_tpu import Index` without making bare
    # `import instsearch_tpu` pay the jax/flax import cost
    if name == "Index":
        from .index import Index
        return Index
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
