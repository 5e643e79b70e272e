from .trainer import (
    TrainState, Trainer, contrastive_loss, smoothap_loss, triplet_loss,
)

__all__ = ["TrainState", "Trainer", "contrastive_loss", "smoothap_loss",
           "triplet_loss"]
