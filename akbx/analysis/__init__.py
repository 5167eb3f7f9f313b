from akbx.analysis import legendre, psf, rectify  # noqa: F401
