from akbx.core import geometry, precision  # noqa: F401
