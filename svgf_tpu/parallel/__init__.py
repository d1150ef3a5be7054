from svgf_tpu.parallel.halo import exchange_row_halo
from svgf_tpu.parallel.sharded import (
    make_row_mesh,
    render_frame_sharded,
    make_sharded_step,
    make_train_step,
)

__all__ = [
    "exchange_row_halo",
    "make_row_mesh",
    "render_frame_sharded",
    "make_sharded_step",
    "make_train_step",
]
