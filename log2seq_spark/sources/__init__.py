"""Data sources: deterministic synthetic transcripts + table catalog."""

from .transcripts import (transcripts, write_transcripts, role_dim, tool_dim,
                          severity_dim)

__all__ = ["transcripts", "write_transcripts", "role_dim", "tool_dim",
           "severity_dim"]
