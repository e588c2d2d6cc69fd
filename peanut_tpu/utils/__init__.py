from .drawing import draw_line, get_contour_points

__all__ = ["draw_line", "get_contour_points"]
