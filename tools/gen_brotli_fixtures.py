#!/usr/bin/env python3
"""Generate Brotli (RFC 7932) spec-data resources and decoder golden fixtures.

Spec data (src/main/resources/extractous/):
  brotli-dict.bin     the 122,784-byte static dictionary defined by RFC 7932
                      Appendix A (sha256 20e42eb1b511c21806d4d227d07e5dd0
                      6877d8ce7b3a817f378f313653f35c70, the value published in
                      the RFC). Extracted from the Google brotli library
                      bundled with the locally installed Arrow (the dictionary
                      is normative spec DATA, not code).
  brotli-ctx.bin      the 4 x 512-byte context lookup tables of RFC 7932 §7.1
                      (LSB6, MSB6, UTF8, Signed), same provenance.

Goldens (src/test/resources/golden/brotli/): <case>.raw + <case>_q<N>.br
compressed by the REAL brotli encoder (Google brotli via pyarrow.Codec) at
qualities 0..11 — the decoder in core/Brotli.scala is proven against the
reference implementation, not a co-written encoder (same construction as
ZstdSpec / XzSpec / Bzip2Spec).

All golden inputs are synthesized deterministically below — no external data.
"""
import glob, hashlib, os, random, sys

import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(REPO, "src/main/resources/extractous")
GOLD = os.path.join(REPO, "src/test/resources/golden/brotli")
os.makedirs(RES, exist_ok=True)
os.makedirs(GOLD, exist_ok=True)

# ---- spec data extraction ----
lib = None
for cand in glob.glob(os.path.join(os.path.dirname(pa.__file__), "libarrow.so*")):
    lib = cand
data = open(lib, "rb").read()

di = data.find(b"timedownlifeleftbackcodedatashow")
assert di >= 0, "static dictionary not found"
dict_bytes = data[di:di + 122784]
assert hashlib.sha256(dict_bytes).hexdigest() == \
    "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70", \
    "dictionary sha256 does not match the RFC 7932 published value"
open(os.path.join(RES, "brotli-dict.bin"), "wb").write(dict_bytes)

lsb6 = bytes(range(64)) * 4 + bytes(256)
msb6 = bytes(i >> 2 for i in range(256)) + bytes(256)
ci = data.find(lsb6 + msb6)
assert ci >= 0, "context lookup table not found"
ctx = data[ci:ci + 2048]
# sanity: UTF8 lut0 classifies space as 8, lowercase vowels as 56
assert ctx[1024 + 0x20] == 8 and ctx[1024 + ord('a')] == 56
open(os.path.join(RES, "brotli-ctx.bin"), "wb").write(ctx)

# ---- deterministic golden inputs ----
rnd = random.Random(20260818)

def english(n_sent):
    subj = ["the archive", "a crawler", "this document", "the index", "our pipeline",
            "the server", "a browser", "the corpus", "that page", "the library"]
    verb = ["stores", "reads", "fetches", "extracts", "compresses", "indexes",
            "validates", "streams", "rewrites", "samples"]
    obj = ["every record", "the response body", "a million pages", "the text layer",
           "all known links", "the byte stream", "the metadata", "its own output",
           "the daily snapshot", "the remaining shards"]
    tail = ["with care", "in order", "for later use", "over the network", "at scale",
            "without loss", "by design", "before midnight", "for the report", "as usual"]
    out = []
    for i in range(n_sent):
        s = f"{rnd.choice(subj)} {rnd.choice(verb)} {rnd.choice(obj)} {rnd.choice(tail)}."
        if i % 7 == 0:
            s = s.capitalize()
        out.append(s)
    return (" ".join(out)).encode()

def html_doc(n):
    rows = []
    for i in range(n):
        rows.append(f'<div class="row item-{i}"><a href="https://example.com/page/{i}?ref=idx">'
                    f'Item {i}</a> <span id=\'s{i}\'>value {i * 37 % 1000}</span></div>')
    return ("<!DOCTYPE html><html><head><title>Listing</title></head><body>"
            + "\n".join(rows) + "</body></html>").encode()

cases = {}
cases["empty"] = b""
cases["fox"] = b"the quick brown fox jumps over the lazy dog."
cases["dictwords"] = (b"time down life left back code data show only site city open "
                      b"just like free work text year over body love form book play "
                      b"live line help home side more word long them view find page "
                      b"days full head term each area from true mark able upon high "
                      b"date land news game save feed week. The Code And The Data "
                      b"SHOW ONLY the.com/ site, with \"quotes\" and ='attrs'.")
cases["english"] = english(180)
cases["html"] = html_doc(220)
cases["repeat"] = b"abcdefg" * 3000
cases["random"] = rnd.randbytes(4096)
cases["allbytes"] = bytes(range(256)) * 16
cases["utf8"] = ("Der schnelle braune Fuchs. Ο γρήγορος καφέ σκύλος. "
                 "Быстрая коричневая лиса прыгает через ленивую собаку. "
                 "素早い茶色の狐が怠惰な犬を飛び越える。 빠른 갈색 여우. "
                 "तेज़ भूरी लोमड़ी आलसी कुत्ते के ऊपर कूदती है। "
                 "Voilà un café brûlé, naïve façade, jalapeño. " * 24).encode()
cases["lines"] = ("\n".join(f"{i:06d}: status=OK bytes={i * 91 % 4096} path=/data/part-{i % 17}"
                            for i in range(300))).encode()
cases["big"] = (english(2400) + b"\n" + html_doc(1500) + cases["utf8"] * 6
                + cases["repeat"] + rnd.randbytes(16384) + english(1200))

QUALITIES = {name: (0, 1, 2, 5, 6, 9, 11) for name in cases}
QUALITIES["big"] = (1, 5, 11)

manifest = []
for name, raw in cases.items():
    open(os.path.join(GOLD, f"{name}.raw"), "wb").write(raw)
    for q in QUALITIES[name]:
        codec = pa.Codec("brotli", compression_level=q)
        comp = codec.compress(raw, asbytes=True)
        open(os.path.join(GOLD, f"{name}_q{q}.br"), "wb").write(comp)
        manifest.append((name, q, len(raw), len(comp)))

for name, q, rl, cl in manifest:
    print(f"{name:10s} q{q:<2d} raw={rl:7d} br={cl:7d}")
print(f"total cases: {len(cases)}, goldens: {len(manifest)}")
