from . import hub, layers  # noqa: F401
