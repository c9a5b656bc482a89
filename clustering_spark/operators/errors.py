"""Shared typed exceptions for the binary-decode family.

``EncryptedContainerError`` marks a container that is undecryptable
BY DESIGN (password-protected PDF, ZIP member with the encryption
flag) — curation signal, not corruption. Routers classify it by
TYPE; the previous substring heuristic (``"encrypted" in str(e)``)
misfiled any unrelated ValueError whose message happened to carry
the word, and a rewording of a raise silently reverted rows to
'corrupt' (round-13 advisor finding). Subclasses ValueError so
existing ``except ValueError`` corruption fences still contain it.
"""

from __future__ import annotations


class EncryptedContainerError(ValueError):
    """The container is encrypted; its payload is ciphertext."""


__all__ = ["EncryptedContainerError"]
