"""Spreadsheet-like (sheet/rows) parsing.

Parity with /root/reference/deepdoc/parser/excel_parser.py:95-160:

* :func:`sheet_rows_to_lines` — per data row, ``"header：value; ..."``
  fields joined with "; ", suffixed with " ——{sheet}" when the sheet
  has a meaningful name (``__call__``, :133-155);
* :func:`sheet_rows_to_html` — ``chunk_rows``-row ``<table>`` chunks,
  header row repeated per chunk, sheet name as caption
  (``html``, :95-131).

The openpyxl/xlsx byte-level decoding is out of scope (no office
codecs in this container); sheet content arrives as structured rows in
the document payload: ``{"sheets": [{"name": ..., "rows": [[...]]}]}``.
"""

from __future__ import annotations

from html import escape


def sheet_rows_to_lines(sheets: list[dict]) -> list[str]:
    """Header-labeled row lines."""
    res: list[str] = []
    for sheet in sheets:
        rows = sheet.get("rows", [])
        if not rows:
            continue
        headers = rows[0]
        name = sheet.get("name", "Sheet1")
        for r in rows[1:]:
            fields = []
            for i, c in enumerate(r):
                if c is None or c == "":
                    continue
                t = str(headers[i]) if i < len(headers) else ""
                t += ("：" if t else "") + str(c)
                fields.append(t)
            line = "; ".join(fields)
            if name.lower().find("sheet") < 0:
                line += " ——" + name
            res.append(line)
    return res


def sheet_rows_to_html(sheets: list[dict], chunk_rows: int = 256) -> list[str]:
    """HTML table chunks of ``chunk_rows`` rows each."""
    chunks: list[str] = []
    for sheet in sheets:
        rows = sheet.get("rows", [])
        if not rows:
            continue
        name = sheet.get("name", "Sheet1")
        header_html = "<tr>" + "".join(
            f"<th>{escape('' if t is None else str(t).strip())}</th>" for t in rows[0]
        ) + "</tr>"
        n_data = len(rows) - 1
        for chunk_i in range(n_data // chunk_rows + 1):
            tb = f"<table><caption>{name}</caption>" + header_html
            lo = 1 + chunk_i * chunk_rows
            hi = min(1 + (chunk_i + 1) * chunk_rows, len(rows))
            for r in rows[lo:hi]:
                tb += "<tr>"
                for c in r:
                    tb += "<td></td>" if c is None else f"<td>{c}</td>"
                tb += "</tr>"
            tb += "</table>\n"
            chunks.append(tb)
    return chunks
