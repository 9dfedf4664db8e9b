from .noise import velocity_noise

__all__ = ["velocity_noise"]
