from .mesh import (BATCH_AXIS, SPEC_AXIS, batch_sharded,  # noqa: F401
                   grid_sharded, make_mesh, replicated)
from .lines import (device_line_pack, line_kernel_arrays,  # noqa: F401
                    make_sharded_step)
