"""Gene vocabulary: the ordered index→symbol table defining the RNA layout.

The reference ships ``2_GeneExpression/genes.txt`` (12,779 lines incl.
header) as the canonical ordering of the 12,778-gene input vector
(SURVEY.md §2.1 #24). This module reads that format, validates an RNA CSV
against it, and reorders expression matrices into vocabulary order so models
trained on one column ordering can score data stored in another.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

REFERENCE_GENES_TXT = "/root/reference/2_GeneExpression/genes.txt"


class GeneVocabulary:
    def __init__(self, symbols: list[str]):
        self.symbols = list(symbols)
        self.index = {s: i for i, s in enumerate(self.symbols)}

    @classmethod
    def from_file(cls, path: str) -> "GeneVocabulary":
        """Reads the reference genes.txt format: a CSV with a header line and
        ``index,symbol`` rows (``2_GeneExpression/genes.txt``); plain
        one-symbol-per-line files are accepted too."""
        with open(path) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        symbols = [ln.split(",")[-1] for ln in lines[1:]]  # drop header
        return cls(symbols)

    def __len__(self) -> int:
        return len(self.symbols)

    def __contains__(self, symbol: str) -> bool:
        return symbol in self.index

    def validate_width(self, n_rna_columns: int) -> None:
        if n_rna_columns != len(self):
            raise ValueError(
                f"RNA input has {n_rna_columns} 'rna_' columns but the gene "
                f"vocabulary defines {len(self)} genes"
            )

    def reorder(self, frame: pd.DataFrame, column_to_symbol) -> np.ndarray:
        """(N, G) matrix in vocabulary order from a frame whose RNA columns
        map to symbols via ``column_to_symbol(col) -> symbol``."""
        cols = {}
        for c in frame.columns:
            sym = column_to_symbol(c)
            if sym is not None and sym in self.index:
                cols[self.index[sym]] = c
        missing = len(self) - len(cols)
        if missing:
            raise ValueError(f"{missing} vocabulary genes missing from frame")
        ordered = [cols[i] for i in range(len(self))]
        return frame[ordered].to_numpy(np.float32)
