from .shims import *  # noqa: F401,F403
