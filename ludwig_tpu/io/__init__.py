from ludwig_tpu.io.checkpoint import (read_state, write_state,
                                      restart_filename)  # noqa: F401
