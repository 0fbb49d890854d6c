"""File sources & sinks (SURVEY.md §2.1)."""
