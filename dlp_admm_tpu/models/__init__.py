"""Planner formulations (SURVEY.md §2.4: one coordinator, five layouts)."""
from .aladin import AladinEngine, AladinProblem, AladinState  # noqa: F401
from .bilevel import (  # noqa: F401
    BilevelObcaPlanner,
    FixedDualState,
    TighteningObcaPlanner,
    TighteningSlackObcaPlanner,
    solve_collision_duals,
)
from .obca import (  # noqa: F401
    BarState,
    CentralizedObcaPlanner,
    ConsensusObcaPlanner,
)
from .pi_admm import PiAdmmEngine, StepRecord  # noqa: F401
