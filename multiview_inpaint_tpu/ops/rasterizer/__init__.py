from .api import RenderCamera, RenderOutput, render, render_oracle
from .composite import DEPTH_EMPTY
