from .topk_matmul import default_tile_n, topk_matmul

__all__ = ["default_tile_n", "topk_matmul"]
