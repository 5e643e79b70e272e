from .topk_matmul import (default_tile_n, topk_matmul,
                          topk_matmul_int4, topk_matmul_int8)

__all__ = ["default_tile_n", "topk_matmul", "topk_matmul_int4",
           "topk_matmul_int8"]
