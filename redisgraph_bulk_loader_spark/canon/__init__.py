from .components import connected_components  # noqa: F401
