from .colormap import render_frame_2d, evaluate_gradient
from .streamlines import compute_streamline_segments, rasterize_streamlines
from .raymarch import raymarch_density, render_frame_3d
