"""Interop layers for users coming from other stacks (reference L7:
the torch/TorchRL alternative path, SURVEY.md §1)."""
