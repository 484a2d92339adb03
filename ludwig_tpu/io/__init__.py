from ludwig_tpu.io.checkpoint import (read_state, write_state,
                                      restart_filename)  # noqa: F401
from ludwig_tpu.io.sharded import (read_sharded, read_subfile_set,
                                   write_sharded)  # noqa: F401
