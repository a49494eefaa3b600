"""Generic ISO/IEC 8211 (DDF) reader — the full data-descriptive-record
path the S-57 module hardcodes: field labels + format controls from the
DDR drive subfield decoding of every data record.

Reference behavior: frmts/iso8211/ (ddfmodule.cpp leader/directory walk,
ddffielddefn.cpp ApplyFormats — format strings like "(A(4),2I(6),B(16))"
with repetition counts and nested groups, labels "A!B!C" with "*"
array-descriptor prefixes, delimited variants A/I/R without widths) and
ddfsubfielddefn.cpp (A=chars, I=int, R=real, B=big-endian binary of
w bits, b1x/b2x little-endian unsigned/signed bytes).

This is driver-side metadata machinery (SDTS/S-57 headers are KBs);
pixel/feature payloads fan out to Spark tasks in the format modules.
"""

from __future__ import annotations

import re

FT = b"\x1e"          # field terminator
UT = b"\x1f"          # unit terminator


def scan_records(path: str):
    """[(offset, length)] for every 8211 record, DDR first."""
    out = []
    with open(path, "rb") as f:
        off = 0
        while True:
            head = f.read(5)
            if len(head) < 5 or not head.strip():
                break
            try:
                ln = int(head)
            except ValueError:
                break
            if ln < 24:
                break                      # corrupt/truncated leader
            out.append((off, ln))
            f.seek(off + ln)
            off += ln
    return out


def _directory(rec: bytes):
    """leader + directory -> [(tag, length, position)], field area base."""
    field_area = int(rec[12:17])
    size_len = int(rec[20:21])
    size_pos = int(rec[21:22])
    size_tag = int(rec[23:24])
    width = size_len + size_pos + size_tag
    out = []
    i = 24
    while i + width <= len(rec) and rec[i:i + 1] != FT:
        tag = rec[i:i + size_tag].decode("ascii")
        ln = int(rec[i + size_tag:i + size_tag + size_len])
        pos = int(rec[i + size_tag + size_len:i + width])
        out.append((tag, ln, pos))
        i += width
    return out, field_area


def parse_format(fmt: str):
    """Format controls -> flat [(type char, width or None)] with
    repetition counts and nested parentheses expanded."""
    fmt = fmt.strip()
    if fmt.startswith("(") and fmt.endswith(")"):
        fmt = fmt[1:-1]
    out = []
    pos = 0
    n = len(fmt)
    while pos < n:
        m = re.match(r"(\d*)", fmt[pos:])
        rep = int(m.group(1)) if m.group(1) else 1
        pos += m.end()
        if pos >= n:
            break
        if fmt[pos] == "(":
            depth = 1
            j = pos + 1
            while depth:
                if fmt[j] == "(":
                    depth += 1
                elif fmt[j] == ")":
                    depth -= 1
                j += 1
            inner = parse_format(fmt[pos:j])
            out.extend(inner * rep)
            pos = j
        else:
            t = fmt[pos]
            pos += 1
            width = None
            # binary variants: B(16), b12, b24 etc.
            if pos < n and fmt[pos] == "(":
                j = fmt.index(")", pos)
                width = int(fmt[pos + 1:j])
                if t in ("B", "b"):
                    width //= 8
                pos = j + 1
            elif t == "b" and pos + 1 < n and fmt[pos].isdigit():
                # bXY: X = 1 unsigned / 2 signed, Y = byte count (LE)
                t = "b" + fmt[pos]
                width = int(fmt[pos + 1])
                pos += 2
            out.extend([(t, width)] * rep)
        if pos < n and fmt[pos] == ",":
            pos += 1
    return out


class DDFModule:
    """One .DDF file: field definitions from the DDR + record decode."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self.buf = f.read()
        self.records = scan_records(path)
        self.defs = {}
        ddr = self.buf[self.records[0][0]:
                       self.records[0][0] + self.records[0][1]]
        entries, area = _directory(ddr)
        for tag, ln, pos in entries:
            body = ddr[area + pos:area + pos + ln].rstrip(FT)
            parts = body.split(UT)
            if len(parts) >= 3:
                labels = parts[1].decode("ascii", "replace")
                fmt = parts[2].decode("ascii", "replace")
                # "*" separates array descriptor from element labels
                labels = labels.split("*")[-1]
                names = [x for x in labels.split("!") if x]
                self.defs[tag] = (names, parse_format(fmt))
            else:
                self.defs[tag] = ([], [])

    def __iter__(self):
        """Yield {tag: [ {subfield: value}, ... repetitions ]} per data
        record. Handles leader id 'R' (ddfrecord.cpp nReuseHeader):
        after such a record, the stream carries bare field areas of the
        same size and directory, no leaders."""
        buf = self.buf
        pos = self.records[0][0] + self.records[0][1]     # after DDR
        reuse = None                     # (entries, field-area size)
        while pos < len(buf):
            if reuse is None:
                head = buf[pos:pos + 5]
                if len(head) < 5 or not head.strip():
                    break
                try:
                    ln = int(head)
                except ValueError:
                    break
                if ln < 24:
                    break
                rec = buf[pos:pos + ln]
                entries, area = _directory(rec)
                if rec[6:7] == b"R":
                    reuse = (entries, area, ln - area)
                yield self._fields(entries, rec[area:ln])
                pos += ln
            else:
                entries, _area, fsize = reuse
                body = buf[pos:pos + fsize]
                if len(body) < fsize // 2:
                    break                 # truncated tail
                yield self._fields(entries, body)
                pos += fsize

    def _fields(self, entries, area: bytes):
        row = {}
        for tag, fln, fpos in entries:
            body = area[fpos:fpos + fln]
            if body.endswith(FT):
                body = body[:-1]
            row.setdefault(tag, []).extend(self._decode(tag, body))
        return row

    def _decode(self, tag: str, body: bytes):
        names, fmts = self.defs.get(tag, ([], []))
        if not fmts:
            return [{"_raw": body}]
        reps = []
        pos = 0
        while pos < len(body):
            vals = {}
            for k, (t, w) in enumerate(fmts):
                name = names[k % len(names)] if names else str(k)
                if t == "A":
                    if w is None:
                        j = body.find(UT, pos)
                        j = j if j >= 0 else len(body)
                        raw = body[pos:j]
                        pos = j + 1
                    else:
                        raw = body[pos:pos + w]
                        pos += w
                    vals[name] = raw.decode("ascii", "replace").strip()
                elif t in ("I", "R", "S", "C"):
                    if w is None:
                        j = body.find(UT, pos)
                        j = j if j >= 0 else len(body)
                        raw = body[pos:j]
                        pos = j + 1
                    else:
                        raw = body[pos:pos + w]
                        pos += w
                    s = raw.decode("ascii", "replace").strip() or "0"
                    try:
                        vals[name] = int(s) if t == "I" else float(s)
                    except ValueError:
                        vals[name] = s
                elif t == "B":                      # big-endian signed
                    raw = body[pos:pos + w]
                    pos += w
                    vals[name] = int.from_bytes(raw, "big", signed=True)
                elif t in ("b1", "b2"):             # LE unsigned/signed
                    raw = body[pos:pos + w]
                    pos += w
                    vals[name] = int.from_bytes(raw, "little",
                                                signed=t == "b2")
                else:
                    raise ValueError(f"format type {t!r} unsupported")
            reps.append(vals)
            if not any(w is not None for _t, w in fmts) and reps:
                if pos >= len(body):
                    break
        return reps
