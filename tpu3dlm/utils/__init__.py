"""Host-side utilities: config, natural sort, checkpointing, visualisation."""
