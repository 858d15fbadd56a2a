from .obstacles import build_obstacle_mask, inside_shape_mask
from .sources import apply_custom_source, add_density, add_velocity
from .interact import add_force_to_area, mouse_drag_force
