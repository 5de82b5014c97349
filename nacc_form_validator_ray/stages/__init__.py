"""Ray Data stages: batch transforms composing the engine's operators."""
