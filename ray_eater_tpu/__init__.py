"""ray_eater_tpu — a TPU-native rendering framework (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of the Vulkan/Zig renderer
``JohnSmoit/ray-eater``, re-designed TPU-first: pass programs are jitted XLA
programs instead of command buffers, rasterization/splatting run as tiled
Pallas megakernels over HBM-resident framebuffers, and present is
double-buffered device→host DMA. See SURVEY.md for the blueprint.
"""

from . import rmath
from .core.context import Context, ContextConfig
from .core.resources import (AddressMode, Filter, Framebuffer, Sampler,
                             Texture, clear, create_framebuffer,
                             texture_from_array, texture_from_file)
from .core.swapchain import Swapchain
from .core.animation import render_animation
from .core.pipeline import (BlendMode, CompareOp, ComputePipeline, CullMode,
                            FrontFace, GraphicsPipeline, RasterState)
from .core import shaders
from .ops.raster import render_mesh
from .ops.gs import render_gaussians
from .models.mesh import Mesh, fullscreen_quad, mesh, two_planes
from .models.gaussians import (GaussianCloud, eval_sh_colors, gaussian_cloud,
                               load_ply, random_cloud, save_ply)
from .io.obj import load_obj
from .graph.render_graph import FrameProgram, RenderGraph, load_baked

__version__ = "0.1.0"

__all__ = [
    "rmath", "Context", "ContextConfig", "Framebuffer", "Texture", "Sampler",
    "Filter", "AddressMode", "Swapchain", "render_animation",
    "GraphicsPipeline",
    "ComputePipeline", "RasterState", "CullMode", "FrontFace", "CompareOp",
    "BlendMode", "shaders", "render_mesh", "Mesh", "mesh", "two_planes",
    "fullscreen_quad", "clear", "create_framebuffer", "texture_from_array",
    "texture_from_file", "render_gaussians", "GaussianCloud",
    "gaussian_cloud", "random_cloud", "load_ply", "save_ply",
    "eval_sh_colors", "load_obj", "RenderGraph", "FrameProgram",
    "load_baked",
]
