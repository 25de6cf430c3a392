"""Host utilities: checkpoint IO, hub access, device helpers."""
