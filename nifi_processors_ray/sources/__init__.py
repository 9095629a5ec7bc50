"""Sources: the change-event tailer and lake readers."""
