from .banding import case_ladder  # noqa: F401
