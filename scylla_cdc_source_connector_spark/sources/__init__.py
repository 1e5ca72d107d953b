"""Source-side integrations (changelog table formats)."""
