from . import body, camera, files, image, mesh  # noqa: F401
