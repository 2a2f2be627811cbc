from .assign import assign_dense_ids, build_node_registry, detect_duplicates  # noqa: F401
