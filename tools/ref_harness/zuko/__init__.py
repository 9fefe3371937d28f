r"""Minimal stub of the `zuko` helpers the reference imports (diagnostic use
only — lets the untouched reference code run in this container, which has no
zuko wheel). Implemented from the documented semantics (SURVEY.md C10/C11):
a non-learnable LayerNorm and a broadcast-ignoring-last-dims helper.
"""
