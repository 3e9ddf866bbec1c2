from . import schemas, views  # noqa: F401
