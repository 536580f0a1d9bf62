from .gaussians import GaussianParams, GaussianConfig
from . import ply_io
