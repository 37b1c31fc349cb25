"""Sources: batch + streaming readers for the engine's inputs."""
