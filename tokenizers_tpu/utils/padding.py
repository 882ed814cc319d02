"""Padding parameters and batch padding (reference `tokenizers/src/utils/padding.rs`)."""

from __future__ import annotations

from typing import List, Optional

BATCH_LONGEST = "batch_longest"


class PaddingParams:
    __slots__ = (
        "strategy",
        "direction",
        "pad_to_multiple_of",
        "pad_id",
        "pad_type_id",
        "pad_token",
    )

    def __init__(
        self,
        strategy=BATCH_LONGEST,  # BATCH_LONGEST or int (Fixed)
        direction: str = "right",
        pad_to_multiple_of: Optional[int] = None,
        pad_id: int = 0,
        pad_type_id: int = 0,
        pad_token: str = "[PAD]",
    ):
        self.strategy = strategy
        self.direction = direction
        self.pad_to_multiple_of = pad_to_multiple_of
        self.pad_id = pad_id
        self.pad_type_id = pad_type_id
        self.pad_token = pad_token


def pad_encodings(encodings: List, params: PaddingParams) -> None:
    if not encodings:
        return
    if params.strategy == BATCH_LONGEST:
        pad_length = max(len(e.ids) for e in encodings)
    else:
        pad_length = int(params.strategy)
    m = params.pad_to_multiple_of
    if m and pad_length % m > 0:
        pad_length += m - pad_length % m
    for e in encodings:
        e.pad(
            pad_length,
            params.pad_id,
            params.pad_type_id,
            params.pad_token,
            params.direction,
        )
