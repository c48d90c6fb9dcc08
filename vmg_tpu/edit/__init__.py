"""vmg_tpu.edit -- the registry-driven "editing framework" surface.

JAX-native equivalent of the reference's vendored mmedit 0.9 stack
(SURVEY.md §2.3): string-keyed registries, declarative data pipelines,
restorer train/val protocols, a loss zoo, periodic eval/visualization
hooks, and mask generators.  Built fresh on numpy/JAX -- no mmcv.
"""

from vmg_tpu.edit.registry import Registry, MODELS, LOSSES, DATASETS, PIPELINES, build_from_cfg
from vmg_tpu.edit.pipelines import Compose
from vmg_tpu.edit import pipelines as _pipelines  # registers transforms
from vmg_tpu.edit import matting_aug as _matting_aug  # registers transforms
from vmg_tpu.edit import pipelines_extra as _pipelines_extra  # registers transforms
from vmg_tpu.edit import losses as _losses  # registers losses
from vmg_tpu.edit import components as _components  # registers GAN components
from vmg_tpu.edit import stylegan2 as _stylegan2  # registers StyleGAN2
from vmg_tpu.edit.restorer import BasicRestorer
from vmg_tpu.edit.hooks import EvalIterHook, VisualizationHook, HookList
from vmg_tpu.edit.misc import tensor2img
from vmg_tpu.edit.masks import bbox_mask, irregular_mask, brush_stroke_mask
