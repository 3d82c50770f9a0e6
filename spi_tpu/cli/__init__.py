"""Command-line entry points (flag names match the reference CLIs)."""
