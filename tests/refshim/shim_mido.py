"""Fake ``mido`` module: SysEx file IO only (the surface dxdata.py uses)."""

from __future__ import annotations


class Message:
    def __init__(self, type="sysex", data=()):
        if type != "sysex":
            raise ValueError(f"shim only supports sysex messages, got {type!r}")
        self.type = type
        self.data = tuple(int(b) for b in data)
        if any(b < 0 or b > 0x7F for b in self.data):
            raise ValueError("SysEx data bytes must be 7-bit")


def read_syx_file(path):
    with open(path, "rb") as f:
        blob = f.read()
    msgs, i = [], 0
    while True:
        s = blob.find(0xF0, i)
        if s < 0:
            break
        e = blob.find(0xF7, s)
        if e < 0:
            raise ValueError(f"{path}: unterminated SysEx message")
        msgs.append(Message("sysex", data=blob[s + 1 : e]))
        i = e + 1
    return msgs


def write_syx_file(path, messages):
    out = bytearray()
    for m in messages:
        out.append(0xF0)
        out.extend(m.data)
        out.append(0xF7)
    with open(path, "wb") as f:
        f.write(bytes(out))
