from . import models, transforms  # noqa: F401
