from .ngs_java import load_graph_from_ngs  # noqa: F401
from .ngs_text import load_graph, parse_graph_text, serialize_graph  # noqa: F401
from .parquet_graph import read_graph_parquet, write_graph_parquet  # noqa: F401
from .tpch_graph import derive_graphs, load_tables  # noqa: F401
