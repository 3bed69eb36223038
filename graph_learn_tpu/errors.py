"""Error types.

Mirrors the reference's status-code -> exception mapping
(reference: graphlearn/python/errors.py:1-217, common/base/status.cc) with a
plain Python exception hierarchy; there is no wire Status since ops run
in-process / on-device.
"""

from __future__ import annotations


class GLError(Exception):
    """Base error for the framework."""


class OutOfRangeError(GLError):
    """Raised by traversal datasets at the end of an epoch.

    Parity with reference OUT_OF_RANGE status raised from
    node_getter.cc epoch-exhausted generators and caught by trainers
    (reference: examples/tf/trainer.py:131-137).
    """


class InvalidArgumentError(GLError, ValueError):
    pass


class NotFoundError(GLError, KeyError):
    pass


class AlreadyExistsError(GLError):
    pass


class UnimplementedError(GLError, NotImplementedError):
    pass
