"""Host-side utilities: serialization, logging, replay CLI."""
