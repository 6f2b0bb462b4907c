"""Compatibility package: reference code imports ``infer_tools.infer_tool``
and ``infer_tools.slicer``; these re-export the framework equivalents."""
