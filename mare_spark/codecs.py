"""Mount-point codecs: how a DataFrame partition is materialized as files for
a containerized command, and read back.

Behavioral parity with the reference's MountPoint hierarchy
(/root/reference/src/main/scala/se/uu/it/mare/MountPoint.scala):

* ``TextFile``  (MountPoint.scala:60-95)  — one text record per delimiter
  block. Write appends the delimiter after EVERY record including the last
  (:77). Read splits the whole file on the literal delimiter and drops
  trailing empty strings (Java ``String.split`` semantics, :88-90); an empty
  file therefore yields one empty record (Java ``"".split(x) == [""]``).
* ``WholeTextFiles`` (MountPoint.scala:101-144) — one whole text file per
  record; keys become basenames after one hop (:119,:139); same-named
  records overwrite (:120).
* ``BinaryFiles`` (MountPoint.scala:149-183) — identical shape for bytes.

The codecs additionally define the DataFrame representation of each record
type (the reference is RDD-typed; we are DataFrame-native):

=================  =====================================  ==================
codec              reference record type                  DataFrame schema
=================  =====================================  ==================
TextFile           String                                 value: string
WholeTextFiles     (String, String)                       path: string, content: string
BinaryFiles        (String, Array[Byte])                  path: string, content: binary
=================  =====================================  ==================
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from collections.abc import Iterable, Iterator

import pandas as pd


class MountPoint(ABC):
    """Abstract partition⇄file codec bound to a container mount path."""

    #: column schema of the DataFrame representation (DDL string)
    spark_schema: str

    def __init__(self, path: str):
        self.path = path

    # -- host-file side ----------------------------------------------------
    @abstractmethod
    def create_empty(self, host_path: str) -> None: ...

    @abstractmethod
    def write(self, records: Iterable, host_path: str, append: bool = False) -> None: ...

    @abstractmethod
    def read(self, host_path: str) -> list: ...

    # -- DataFrame side ----------------------------------------------------
    @abstractmethod
    def records_from_pandas(self, pdf: pd.DataFrame) -> Iterator: ...

    @abstractmethod
    def records_to_pandas(self, records: list) -> pd.DataFrame: ...


class TextFile(MountPoint):
    """Delimited text records ⇄ ``value: string`` column."""

    spark_schema = "value string"

    def __init__(self, path: str, record_delimiter: str = "\n", charset: str = "UTF-8"):
        super().__init__(path)
        self.record_delimiter = record_delimiter
        self.charset = charset

    def create_empty(self, host_path: str) -> None:
        open(host_path, "a", encoding=self.charset).close()

    def write(self, records: Iterable[str], host_path: str, append: bool = False) -> None:
        mode = "a" if append else "w"
        with open(host_path, mode, encoding=self.charset, newline="") as f:
            for r in records:
                f.write(r)
                f.write(self.record_delimiter)

    def read(self, host_path: str) -> list[str]:
        with open(host_path, encoding=self.charset, newline="") as f:
            content = f.read()
        if content == "":
            return [""]  # Java "".split(x) == [""] — reference read of empty file
        parts = content.split(self.record_delimiter)
        while parts and parts[-1] == "":  # Java split drops trailing empties
            parts.pop()
        return parts

    def records_from_pandas(self, pdf: pd.DataFrame) -> Iterator[str]:
        col = pdf["value"]
        if col.isna().any():
            # astype(str) would serialize a NULL as the literal record
            # 'None' — silent data corruption in the piped stream
            raise ValueError(
                "TextFile: NULL in the 'value' column — a null record "
                "has no text serialization; filter or fill nulls before "
                "piping"
            )
        return iter(col.astype(str))

    def records_to_pandas(self, records: list[str]) -> pd.DataFrame:
        return pd.DataFrame({"value": pd.Series(records, dtype="object")})


class _FilePerRecord(MountPoint):
    """Shared shape of WholeTextFiles / BinaryFiles: a directory of files,
    one per record, keyed by basename."""

    binary: bool

    def create_empty(self, host_path: str) -> None:
        os.makedirs(host_path, exist_ok=True)

    def write(self, records: Iterable[tuple], host_path: str, append: bool = False) -> None:
        # "append" only skips directory re-creation (MountPoint.scala:131-132);
        # same-named files still overwrite.
        if not append:
            self.create_empty(host_path)
        for name, payload in records:
            target = os.path.join(host_path, os.path.basename(name))
            if self.binary:
                with open(target, "wb") as f:
                    f.write(bytes(payload))
            else:
                with open(target, "w", encoding=self.charset, newline="") as f:
                    f.write(payload)

    def read(self, host_path: str) -> list[tuple]:
        out = []
        for name in sorted(os.listdir(host_path)):
            target = os.path.join(host_path, name)
            if self.binary:
                with open(target, "rb") as f:
                    out.append((name, f.read()))
            else:
                with open(target, encoding=self.charset, newline="") as f:
                    out.append((name, f.read()))
        return out

    def records_from_pandas(self, pdf: pd.DataFrame) -> Iterator[tuple]:
        if pdf["path"].isna().any() or pdf["content"].isna().any():
            raise ValueError(
                f"{type(self).__name__}: NULL in 'path'/'content' — a "
                "null file name or payload has no on-disk serialization; "
                "filter or fill nulls before piping"
            )
        return zip(pdf["path"], pdf["content"])


class WholeTextFiles(_FilePerRecord):
    """(file name, file text) records ⇄ ``path, content: string`` columns."""

    spark_schema = "path string, content string"
    binary = False

    def __init__(self, path: str, charset: str = "UTF-8"):
        super().__init__(path)
        self.charset = charset

    def records_to_pandas(self, records: list[tuple]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "path": pd.Series([r[0] for r in records], dtype="object"),
                "content": pd.Series([r[1] for r in records], dtype="object"),
            }
        )


class BinaryFiles(_FilePerRecord):
    """(file name, raw bytes) records ⇄ ``path: string, content: binary``."""

    spark_schema = "path string, content binary"
    binary = True

    def records_to_pandas(self, records: list[tuple]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "path": pd.Series([r[0] for r in records], dtype="object"),
                "content": pd.Series([bytearray(r[1]) for r in records], dtype="object"),
            }
        )
