from .topology import degrees, parent_map, start_nodes, valuable_nodes  # noqa: F401
from .subgraph import induced_subgraph, subgraph_init_node  # noqa: F401
