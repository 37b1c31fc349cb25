"""Physical-plan helpers: parallelism fan-out, explain utilities."""

from .tuning import fan_out  # noqa: F401
