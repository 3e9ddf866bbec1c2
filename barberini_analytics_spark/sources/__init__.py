from . import jsonc, logs, sentiws  # noqa: F401
