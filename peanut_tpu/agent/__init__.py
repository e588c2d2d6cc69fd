from .state import NavAgentState
from .planner import MotionPlanner
from .agent import PeanutAgent

__all__ = ["NavAgentState", "MotionPlanner", "PeanutAgent"]
