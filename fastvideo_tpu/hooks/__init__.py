from fastvideo_tpu.hooks.activation_trace import (close_activation_trace,
                                                  trace_activation,
                                                  trace_batch)

__all__ = ["trace_activation", "trace_batch", "close_activation_trace"]
