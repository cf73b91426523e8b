"""User-facing command-line tools (offline file localization, etc.)."""
