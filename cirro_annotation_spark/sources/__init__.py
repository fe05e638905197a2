"""Sources: delimited-text discovery and readers, HDF ingest."""
