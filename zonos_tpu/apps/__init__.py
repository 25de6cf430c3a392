"""Applications: CLIs, batch synthesis, SRT long-form pipeline, web UI."""
