"""The furchild pipeline re-expressed as PySpark model functions.

One function per reference dbt model; the shared registry carries the
materialization config from the reference's ``dbt_project.yml`` /
per-model ``config()`` blocks.
"""

from furchild_spark.engine.registry import ModelRegistry

registry = ModelRegistry()

from . import staging  # noqa: E402,F401
from . import marts  # noqa: E402,F401
from . import snapshots  # noqa: E402,F401

__all__ = ["registry"]
