"""Framework exceptions (reference utils/errors.py)."""


class HUBModelError(Exception):
    """Raised when a requested hosted model is unavailable."""

    def __init__(self, message: str = "Model not found."):
        super().__init__(message)
