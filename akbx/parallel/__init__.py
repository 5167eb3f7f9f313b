from akbx.parallel import sharding  # noqa: F401
