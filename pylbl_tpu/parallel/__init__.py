from .mesh import (BATCH_AXIS, SPEC_AXIS, batch_sharded,  # noqa: F401
                   grid_sharded, make_mesh, replicated)
from .lines import (UnstackableError, device_line_pack,  # noqa: F401
                    line_kernel_arrays,
                    make_batched_tpu_fn, make_lines_sharded_step,
                    make_multigas_batched_fn,
                    make_multigas_sharded_pipeline, make_sharded_pipeline,
                    make_sharded_step, shard_line_pack,
                    shard_stacked_packs, stack_device_packs)
