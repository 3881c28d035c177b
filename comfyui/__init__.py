"""ComfyUI custom-node package for fastvideo_tpu.

Behavior analog of /root/reference/comfyui/__init__.py: re-exports the
node class mappings so ComfyUI discovers the nodes when this directory
is placed under ``custom_nodes/``.
"""

from comfyui.video_generator import (NODE_CLASS_MAPPINGS,
                                     NODE_DISPLAY_NAME_MAPPINGS)

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
