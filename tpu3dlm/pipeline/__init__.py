"""L5 orchestration: detector/classifier stages, config, pipeline, CLI."""
