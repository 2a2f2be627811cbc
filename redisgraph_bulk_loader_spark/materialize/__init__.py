from .tables import GraphCatalog  # noqa: F401
