"""Command-line tools (also exposed as console scripts via pyproject.toml)."""
