"""javabin — Solr's default binary wire format (version 2), byte-exact.

Reference: solr/solrj/src/java/org/apache/solr/common/util/
JavaBinCodec.java (tag constants :45-79, writeTag size packing
:305-317, writeStr UTF-8 tag+length :571-585, writeInt/writeLong small
forms :600-643, extern-string back-reference table :786-800,
SolrDocument :335-352, SolrDocumentList :381-393, NamedList :142-150,
writeMap :712-723, writeIterator :446-452) and
solr/core/src/java/org/apache/solr/response/BinaryResponseWriter.java
(wt=javabin renders the same NamedList envelope the other writers do).

Golden-tested byte-for-byte in tests/test_javabin.py against 51 corpora
produced by compiling and running the reference's own JavaBinCodec
(tools/gen_javabin_goldens.java).

Python carries no Integer/Long/Float/Double distinction, so the writer
takes wrapper types (JLong, JFloat, ...) where the Java boxed type
matters; bare int maps to Integer when it fits and Long otherwise, bare
float to Double (Java's widest), exactly how a JVM client would see the
values.  The codec is driver-side only: it renders the ALREADY-BOUNDED
response page (k docs + bounded facet tables) — never corpus data.
"""

from __future__ import annotations

import struct

NULL = 0
BOOL_TRUE = 1
BOOL_FALSE = 2
BYTE = 3
SHORT = 4
DOUBLE = 5
INT = 6
LONG = 7
FLOAT = 8
DATE = 9
MAP = 10
SOLRDOC = 11
SOLRDOCLST = 12
BYTEARR = 13
ITERATOR = 14
END = 15
SOLRINPUTDOC = 16
ENUM_FIELD_VALUE = 18
MAP_ENTRY = 19
STR = 1 << 5
SINT = 2 << 5
SLONG = 3 << 5
ARR = 4 << 5
ORDERED_MAP = 5 << 5
NAMED_LST = 6 << 5
EXTERN_STRING = 7 << 5

_VERSION = 2


class NamedList:
    """Ordered (name, value) pairs; names repeat (NamedList.java)."""

    def __init__(self, pairs=None):
        self.pairs = list(pairs or [])

    def add(self, name, val):
        self.pairs.append((name, val))

    def __iter__(self):
        return iter(self.pairs)

    def __len__(self):
        return len(self.pairs)

    def __eq__(self, other):
        return type(self) is type(other) and self.pairs == other.pairs

    def __repr__(self):
        return f"{type(self).__name__}({self.pairs!r})"

    def get(self, name, default=None):
        for n, v in self.pairs:
            if n == name:
                return v
        return default


class SimpleOrderedMap(NamedList):
    """NamedList subclass serialized with the ORDERED_MAP tag."""


class SolrDocument:
    def __init__(self, fields=None, children=None):
        self.fields = list(fields or [])  # (name, value) pairs
        self.children = list(children or [])

    def set(self, name, val):
        self.fields.append((name, val))

    def __eq__(self, other):
        return (
            isinstance(other, SolrDocument)
            and self.fields == other.fields
            and self.children == other.children
        )

    def __repr__(self):
        return f"SolrDocument({self.fields!r})"


class SolrDocumentList(list):
    def __init__(self, docs=(), num_found=0, start=0, max_score=None):
        super().__init__(docs)
        self.num_found = num_found
        self.start = start
        self.max_score = max_score  # None or float (Java Float)

    def __eq__(self, other):
        return (
            isinstance(other, SolrDocumentList)
            and list(self) == list(other)
            and self.num_found == other.num_found
            and self.start == other.start
            and self.max_score == other.max_score
        )

    __hash__ = None


class SolrInputDocument:
    """Input-side document (SolrInputDocument.java): doc boost, fields
    with optional per-field boost, nested children."""

    def __init__(self, fields=None, boost=1.0, children=None):
        # fields: (name, value) or (name, value, boost) tuples
        self.fields = [
            (f + (1.0,) if len(f) == 2 else f) for f in (fields or [])
        ]
        self.boost = boost
        self.children = list(children or [])

    def set(self, name, val, boost=1.0):
        self.fields.append((name, val, boost))

    def __eq__(self, other):
        return (
            isinstance(other, SolrInputDocument)
            and self.fields == other.fields
            and self.boost == other.boost
            and self.children == other.children
        )

    def __repr__(self):
        return f"SolrInputDocument({self.fields!r})"


class EnumFieldValue:
    def __init__(self, int_value: int, string_value: str):
        self.int_value = int_value
        self.string_value = string_value

    def __eq__(self, other):
        return (
            isinstance(other, EnumFieldValue)
            and self.int_value == other.int_value
            and self.string_value == other.string_value
        )


class MapEntry:
    def __init__(self, key, value):
        self.key = key
        self.value = value

    def __eq__(self, other):
        return (
            isinstance(other, MapEntry)
            and self.key == other.key
            and self.value == other.value
        )


class _Wrapper:
    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __eq__(self, other):
        return type(self) is type(other) and self.value == other.value

    def __repr__(self):
        return f"{type(self).__name__}({self.value!r})"


class JInt(_Wrapper):
    """Force Java Integer encoding."""


class JLong(_Wrapper):
    """Force Java Long encoding."""


class JFloat(_Wrapper):
    """Java Float (32-bit); bare Python float encodes as Double."""


class JDouble(_Wrapper):
    """Force Java Double encoding (same as bare float)."""


class JByte(_Wrapper):
    """Java Byte."""


class JShort(_Wrapper):
    """Java Short."""


class JDate(_Wrapper):
    """java.util.Date — value is epoch MILLIS (long)."""


class _EndObj:
    def __repr__(self):
        return "END_OBJ"


END_OBJ = _EndObj()

_INT32_MIN, _INT32_MAX = -(1 << 31), (1 << 31) - 1


class JavaBinEncoder:
    """One-shot encoder (the reference forbids codec reuse too)."""

    def __init__(self):
        self._buf = bytearray()
        self._strings: dict[str, int] = {}
        self._strings_count = 0

    # --- low-level ---
    def _byte(self, b: int) -> None:
        self._buf.append(b & 0xFF)

    def _vint(self, i: int) -> None:
        while i & ~0x7F:
            self._byte((i & 0x7F) | 0x80)
            i >>= 7
        self._byte(i)

    def _vlong(self, i: int) -> None:
        while i & ~0x7F:
            self._byte((i & 0x7F) | 0x80)
            i >>= 7
        self._byte(i)

    def _tag(self, tag: int, size: int | None = None) -> None:
        if size is None:
            self._byte(tag)
        elif tag & 0xE0:
            if size < 0x1F:
                self._byte(tag | size)
            else:
                self._byte(tag | 0x1F)
                self._vint(size - 0x1F)
        else:
            self._byte(tag)
            self._vint(size)

    # --- typed writers (JavaBinCodec.java write*) ---
    def _write_str(self, s: str) -> None:
        b = s.encode("utf-8")
        self._tag(STR, len(b))
        self._buf += b

    def _write_extern_string(self, s: str | None) -> None:
        if s is None:
            self._tag(NULL)
            return
        idx = self._strings.get(s, 0)
        self._tag(EXTERN_STRING, idx)
        if idx == 0:
            self._write_str(s)
            self._strings_count += 1
            self._strings[s] = self._strings_count

    def _write_int(self, val: int) -> None:
        if val > 0:
            b = SINT | (val & 0x0F)
            if val >= 0x0F:
                self._byte(b | 0x10)
                self._vint(val >> 4)
            else:
                self._byte(b)
        else:
            self._byte(INT)
            self._buf += struct.pack(">i", val)

    def _write_long(self, val: int) -> None:
        if (val & 0xFF00000000000000) == 0 and val >= 0:
            b = SLONG | (val & 0x0F)
            if val >= 0x0F:
                self._byte(b | 0x10)
                self._vlong(val >> 4)
            else:
                self._byte(b)
        else:
            self._byte(LONG)
            self._buf += struct.pack(">q", val)

    def _write_named_list(self, nl: NamedList) -> None:
        tag = ORDERED_MAP if isinstance(nl, SimpleOrderedMap) else NAMED_LST
        self._tag(tag, len(nl.pairs))
        for name, val in nl.pairs:
            self._write_extern_string(name)
            self.write_val(val)

    def _write_solr_document(self, doc: SolrDocument) -> None:
        self._tag(SOLRDOC)
        self._tag(ORDERED_MAP, len(doc.fields) + len(doc.children))
        for name, val in doc.fields:
            self._write_extern_string(name)
            self.write_val(val)
        for child in doc.children:
            self._write_solr_document(child)

    def _write_solr_input_document(self, doc: SolrInputDocument) -> None:
        # writeSolrInputDocument: tag+size vint, doc boost float, then
        # [field boost if != 1.0] extern name, value; children inline
        self._tag(SOLRINPUTDOC, len(doc.fields) + len(doc.children))
        self._byte(FLOAT)
        self._buf += struct.pack(">f", doc.boost)
        for name, val, boost in doc.fields:
            if boost != 1.0:
                self._byte(FLOAT)
                self._buf += struct.pack(">f", boost)
            self._write_extern_string(name)
            self.write_val(val)
        for child in doc.children:
            self._write_solr_input_document(child)

    def _write_solr_document_list(self, docs: SolrDocumentList) -> None:
        self._tag(SOLRDOCLST)
        header = [
            JLong(docs.num_found),
            JLong(docs.start),
            None if docs.max_score is None else JFloat(docs.max_score),
        ]
        self._write_array(header)
        self._write_array(list(docs))

    def _write_array(self, lst) -> None:
        self._tag(ARR, len(lst))
        for v in lst:
            self.write_val(v)

    def _write_map(self, m: dict) -> None:
        self._tag(MAP, len(m))
        for k, v in m.items():
            if isinstance(k, str):
                self._write_extern_string(k)
            else:
                self.write_val(k)
            self.write_val(v)

    def _write_iterator(self, it) -> None:
        self._tag(ITERATOR)
        for v in it:
            self.write_val(v)
        self._tag(END)

    def write_val(self, val) -> None:
        # primitive dispatch order mirrors writePrimitive/writeKnownType
        if val is None:
            self._byte(NULL)
        elif val is END_OBJ:
            self._byte(END)
        elif isinstance(val, str):
            self._write_str(val)
        elif isinstance(val, bool):  # before int: bool is an int subclass
            self._byte(BOOL_TRUE if val else BOOL_FALSE)
        elif isinstance(val, JInt):
            self._write_int(val.value)
        elif isinstance(val, JLong):
            self._write_long(val.value)
        elif isinstance(val, JFloat):
            self._byte(FLOAT)
            self._buf += struct.pack(">f", val.value)
        elif isinstance(val, JDouble):
            self._byte(DOUBLE)
            self._buf += struct.pack(">d", val.value)
        elif isinstance(val, JByte):
            self._byte(BYTE)
            self._byte(val.value & 0xFF)
        elif isinstance(val, JShort):
            self._byte(SHORT)
            self._buf += struct.pack(">h", val.value)
        elif isinstance(val, JDate):
            self._byte(DATE)
            self._buf += struct.pack(">q", val.value)
        elif isinstance(val, int):
            if _INT32_MIN <= val <= _INT32_MAX:
                self._write_int(val)
            else:
                self._write_long(val)
        elif isinstance(val, float):
            self._byte(DOUBLE)
            self._buf += struct.pack(">d", val)
        elif isinstance(val, (bytes, bytearray)):
            self._tag(BYTEARR, len(val))
            self._buf += bytes(val)
        elif isinstance(val, NamedList):
            self._write_named_list(val)
        elif isinstance(val, SolrDocumentList):  # before list
            self._write_solr_document_list(val)
        elif isinstance(val, (list, tuple)):
            self._write_array(val)
        elif isinstance(val, SolrDocument):
            self._write_solr_document(val)
        elif isinstance(val, SolrInputDocument):
            self._write_solr_input_document(val)
        elif isinstance(val, dict):
            self._write_map(val)
        elif isinstance(val, EnumFieldValue):
            self._byte(ENUM_FIELD_VALUE)
            self._write_int(val.int_value)
            self._write_str(val.string_value)
        elif isinstance(val, MapEntry):
            self._byte(MAP_ENTRY)
            self.write_val(val.key)
            self.write_val(val.value)
        elif hasattr(val, "__next__"):
            self._write_iterator(val)
        else:
            # writeVal fallback: class name + toString
            self._write_str(f"{type(val).__name__}:{val!r}")

    def marshal(self, obj) -> bytes:
        self._byte(_VERSION)
        self.write_val(obj)
        return bytes(self._buf)


def dumps(obj) -> bytes:
    """Marshal ``obj`` to javabin v2 bytes (JavaBinCodec.marshal)."""
    return JavaBinEncoder().marshal(obj)


class JavaBinDecoder:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0
        self._strings: list[str] = []

    def _byte(self) -> int:
        b = self._data[self._pos]
        self._pos += 1
        return b

    def _read(self, n: int) -> bytes:
        b = self._data[self._pos : self._pos + n]
        self._pos += n
        return b

    def _vint(self) -> int:
        b = self._byte()
        i = b & 0x7F
        shift = 7
        while b & 0x80:
            b = self._byte()
            i |= (b & 0x7F) << shift
            shift += 7
        return i

    def _size(self, tag: int) -> int:
        sz = tag & 0x1F
        if sz == 0x1F:
            sz += self._vint()
        return sz

    def read_val(self):
        tag = self._byte()
        kind = tag >> 5
        if kind == STR >> 5:
            return self._read(self._size(tag)).decode("utf-8")
        if kind == SINT >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v |= self._vint() << 4
            return v
        if kind == SLONG >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v |= self._vint() << 4
            return JLong(v)
        if kind == ARR >> 5:
            return [self.read_val() for _ in range(self._size(tag))]
        if kind in (ORDERED_MAP >> 5, NAMED_LST >> 5):
            cls = SimpleOrderedMap if kind == ORDERED_MAP >> 5 else NamedList
            nl = cls()
            for _ in range(self._size(tag)):
                name = self.read_val()
                nl.add(name, self.read_val())
            return nl
        if kind == EXTERN_STRING >> 5:
            idx = self._size(tag)
            if idx:
                return self._strings[idx - 1]
            s = self.read_val()
            self._strings.append(s)
            return s
        if tag == NULL:
            return None
        if tag == BOOL_TRUE:
            return True
        if tag == BOOL_FALSE:
            return False
        if tag == BYTE:
            return JByte(struct.unpack(">b", self._read(1))[0])
        if tag == SHORT:
            return JShort(struct.unpack(">h", self._read(2))[0])
        if tag == INT:
            return struct.unpack(">i", self._read(4))[0]
        if tag == LONG:
            return JLong(struct.unpack(">q", self._read(8))[0])
        if tag == FLOAT:
            return JFloat(struct.unpack(">f", self._read(4))[0])
        if tag == DOUBLE:
            return struct.unpack(">d", self._read(8))[0]
        if tag == DATE:
            return JDate(struct.unpack(">q", self._read(8))[0])
        if tag == MAP:
            return {
                self.read_val(): self.read_val()
                for _ in range(self._vint())
            }
        if tag == SOLRDOC:
            # the payload reuses the ORDERED_MAP framing but children are
            # written inline as bare SolrDocument values (readSolrDocument)
            map_tag = self._byte()
            size = self._size(map_tag)
            doc = SolrDocument()
            for _ in range(size):
                obj = self.read_val()
                if isinstance(obj, SolrDocument):
                    doc.children.append(obj)
                    continue
                doc.fields.append((obj, self.read_val()))
            return doc
        if tag == SOLRDOCLST:
            header = self.read_val()
            docs = self.read_val()
            ms = header[2]
            return SolrDocumentList(
                docs,
                num_found=header[0].value,
                start=header[1].value,
                max_score=None if ms is None else ms.value,
            )
        if tag == SOLRINPUTDOC:
            sz = self._vint()
            doc_boost = self.read_val()
            doc = SolrInputDocument(boost=doc_boost.value)
            for _ in range(sz):
                boost = 1.0
                obj = self.read_val()
                if isinstance(obj, JFloat):
                    boost = obj.value
                    obj = self.read_val()
                elif isinstance(obj, SolrInputDocument):
                    doc.children.append(obj)
                    continue
                doc.fields.append((obj, self.read_val(), boost))
            return doc
        if tag == BYTEARR:
            return self._read(self._vint())
        if tag == ITERATOR:
            out = []
            while True:
                v = self.read_val()
                if v is END_OBJ:
                    return out
                out.append(v)
        if tag == END:
            return END_OBJ
        if tag == ENUM_FIELD_VALUE:
            return EnumFieldValue(self.read_val(), self.read_val())
        if tag == MAP_ENTRY:
            return MapEntry(self.read_val(), self.read_val())
        raise ValueError(f"unknown javabin tag {tag}")


def loads(data: bytes):
    """Unmarshal javabin v2 bytes (JavaBinCodec.unmarshal)."""
    dec = JavaBinDecoder(data)
    version = dec._byte()
    if version != _VERSION:
        raise ValueError(f"invalid javabin version {version}")
    return dec.read_val()
