"""Export sinks: Neo4j bulk-import CSV shards and Cypher statement streams."""
