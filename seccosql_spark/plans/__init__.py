"""Plan-construction logic that sits ABOVE Catalyst: join-hypergraph
extraction, GHD decomposition, PK-FK-aware ordering. Output is always a tree
of ordinary ``df.join`` calls, so Spark still owns physical strategy."""
