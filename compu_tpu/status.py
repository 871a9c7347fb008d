"""Status model for the streaming Encoder/Decoder state machine.

This reproduces the behavior contract of the reference's status types
(reference: src/decoder/mod.rs:117-157 and src/encoder/mod.rs:12-49):

- ``DecodeStatus {NeedInput, NeedOutput, Finished}``
- ``Decode {input_remain, output_remain, status}`` where ``status`` is either a
  ``DecodeStatus`` or a ``DecodeError`` wrapping a backend error code
  (decode errors are typed, encode errors are a bare variant — the same
  asymmetry as the reference, src/decoder/mod.rs:117-135 vs
  src/encoder/mod.rs:37).
- ``EncodeOp {Process, Flush, Finish}`` / ``EncodeStatus {Continue, NeedOutput,
  Finished, Error}`` / ``Encode {input_remain, output_remain, status}``.

The contract every backend must honor:

* ``NeedInput``  — all provided input consumed; feed more to continue.
* ``NeedOutput`` — output buffer is exhausted (or pending data remains
  internally); provide fresh output space and call again.
* ``Finished``   — the stream is complete (trailer validated for decode,
  trailer emitted for encode). ``reset()`` re-arms the state for a new
  stream without reallocation.
* ``input_remain`` / ``output_remain`` are *byte counts left unused* in the
  buffers passed to the call, so a caller can suspend at any chunk boundary
  and resume later — this state machine is the checkpoint/resume mechanism.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Union


class DecodeStatus(enum.Enum):
    """Result of a successful decode step (reference: src/decoder/mod.rs:139-146)."""

    #: All input consumed; more input is required to make progress.
    NeedInput = "need_input"
    #: Output buffer has no more space (or undrained data remains internally).
    NeedOutput = "need_output"
    #: Stream fully decoded and trailer verified.
    Finished = "finished"


@dataclasses.dataclass(frozen=True)
class DecodeError:
    """Typed decode error wrapping the backend's raw code
    (reference: src/decoder/mod.rs:117-135).

    ``code`` is backend-specific; ``Decoder.describe_error`` maps it to a
    static human-readable message.
    """

    code: int

    @staticmethod
    def no_error() -> "DecodeError":
        """Placeholder error (code 0) whose description is the generic
        message — mirrors ``DecodeError::no_error`` used by the reference
        tests (tests/decoder.rs:74-76)."""
        return DecodeError(0)

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return f"DecodeError(code={self.code})"


@dataclasses.dataclass(frozen=True)
class Decode:
    """Outcome of one decode call (reference: src/decoder/mod.rs:150-157)."""

    #: Bytes of the provided input that were NOT consumed.
    input_remain: int
    #: Bytes of the provided output buffer that were NOT written.
    output_remain: int
    status: Union[DecodeStatus, DecodeError]

    @property
    def is_error(self) -> bool:
        return isinstance(self.status, DecodeError)


class EncodeOp(enum.Enum):
    """Operation requested from the encoder (reference: src/encoder/mod.rs:12-23)."""

    #: Compress input lazily; the encoder may buffer internally.
    Process = "process"
    #: Emit all buffered data at a byte-aligned resume point.
    Flush = "flush"
    #: Finalize the stream (trailer + checksum). Input may be empty.
    Finish = "finish"


class EncodeStatus(enum.Enum):
    """Result of one encode call (reference: src/encoder/mod.rs:27-38)."""

    #: Operation completed; encoder can accept more input.
    Continue = "continue"
    #: Output buffer exhausted; provide more space and repeat the op.
    NeedOutput = "need_output"
    #: Stream finalized (only after ``EncodeOp.Finish``).
    Finished = "finished"
    #: Encoder failed; state is unusable until ``reset()``.
    Error = "error"


@dataclasses.dataclass(frozen=True)
class Encode:
    """Outcome of one encode call (reference: src/encoder/mod.rs:42-49)."""

    input_remain: int
    output_remain: int
    status: EncodeStatus

    @property
    def is_error(self) -> bool:
        return self.status is EncodeStatus.Error
