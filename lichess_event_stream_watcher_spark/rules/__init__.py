from .model import Action, Criterion, CriterionKind, Rule  # noqa: F401
from .store import SignupRulesManager  # noqa: F401
