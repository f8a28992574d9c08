from .rmap import RMap, fill_rmap, is_reachable  # noqa: F401
from .moves import (  # noqa: F401
    danger_map,
    is_adjacent_enemy,
    is_adjacent_item,
    is_in_bomb_range,
    is_in_danger,
    move_towards_enemy,
    move_towards_position,
    move_towards_powerup,
    move_towards_safe_place,
    safe_condition,
    safe_directions,
    sort_directions,
)
