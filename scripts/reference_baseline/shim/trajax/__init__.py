"""trajax API shim (see optimizers.py)."""

from . import optimizers  # noqa: F401
