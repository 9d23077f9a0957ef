"""Batched game runtime: ECS state, collision, character controller, step."""
