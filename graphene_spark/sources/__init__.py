"""Source readers: structured ingestion of the reference's input formats."""
