"""S8: HTML-table universe ingestion without pandas.read_html.

The reference builds its ticker universe by scraping index-membership
tables from HTML pages (populate_tickers.py:13-37: pd.read_html, pick
the table containing a ``Symbol``/``Ticker`` column). This re-expresses
that on a pure-stdlib parser: extract every <table> from a saved page,
pick the one carrying the symbol column, validate and dedupe tickers.

Scale note: universe pages are a few hundred KB and yield ~10³ rows —
this is deliberately a DRIVER-side parse feeding ``createDataFrame``
(broadcastable dimension), not a distributed operator. The distributed
path for big scraped corpora is the documents table + textstats ops.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class _TableExtractor(HTMLParser):
    """Collect all <table> elements as lists of rows of cell text.

    Handles nested markup inside cells (links, spans) by concatenating
    text, and treats <th> and <td> uniformly (the first row is the
    header, matching pd.read_html(header=0))."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self._table_depth = 0
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._table_depth += 1
            if self._table_depth == 1:
                self.tables.append([])
        elif self._table_depth == 1 and tag == "tr":
            self._row = []
        elif self._table_depth == 1 and tag in ("td", "th"):
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "table":
            self._table_depth -= 1
        elif self._table_depth == 1 and tag == "tr" and self._row is not None:
            if self._row:
                self.tables[-1].append(self._row)
            self._row = None
        elif self._table_depth == 1 and tag in ("td", "th") and self._cell is not None:
            text = "".join(self._cell).strip()
            if self._row is not None:
                self._row.append(text)
            self._cell = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)


def extract_tables(html: str) -> list[tuple[list[str], list[list[str]]]]:
    """All tables in the page as (header, data_rows) pairs; the first
    row is the header (pd.read_html(header=0) convention)."""
    p = _TableExtractor()
    p.feed(html)
    out = []
    for t in p.tables:
        if t:
            out.append((t[0], t[1:]))
    return out


def universe_from_html(
    spark: SparkSession,
    html: str,
    symbol_cols: tuple[str, ...] = ("Symbol", "Ticker"),
) -> DataFrame:
    """Ticker universe from a saved index-membership HTML page: pick
    the first table exposing one of ``symbol_cols`` (ref
    fetch_sp500_tickers / fetch_nasdaq100_tickers), validate with the
    reference's ticker-shape regex, dedupe."""
    for header, rows in extract_tables(html):
        for col in symbol_cols:
            if col in header:
                idx = header.index(col)
                symbols = [(r[idx],) for r in rows if len(r) > idx]
                if not symbols:
                    continue
                df = spark.createDataFrame(symbols, "ticker string")
                return (
                    df.select(F.upper(F.trim("ticker")).alias("ticker"))
                    .where(F.col("ticker").rlike(r"^[A-Z][A-Z0-9.\-]{0,9}$"))
                    .distinct()
                )
    raise ValueError(f"no table with any of {symbol_cols} found in page")
