from .pipeline import build_graph, triple_prf  # noqa: F401
