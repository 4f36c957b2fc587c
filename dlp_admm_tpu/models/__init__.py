"""Planner formulations (SURVEY.md §2.4: one coordinator, five layouts)."""
from .aladin import (  # noqa: F401
    AladinEngine,
    AladinProblem,
    AladinState,
    AladinUnicyclePlanner,
)
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
