#!/usr/bin/env python3
"""Generate the second golden split fixture (round 14).

The first golden fixture (the reference's own
20170315T000000Z-mlab3-sea03-sidestream-0000.tgz) covers whole-bucket
routing on one site-day. This second, hand-built site-day tarball covers
the cases it cannot: the `:::` IPv6 quirk in BOTH directions (collapses
to a whitelisted address / to an unlisted one), a NON-CANONICALLY spelled
whitelisted IPv6, a mid-stream directory entry, malformed/old-format
names, a non-web100 file, and an entry dated EARLIER than its archive
(which must stay private — the age arm reads the archive's date, never
the entry's own).

Routes below are HAND-COMPUTED from the routing spec
(/root/reference/embargo.go:174, embargo_check.go:60-108,
filename_parser.go:17-29) — public iff the ARCHIVE date < cutoff, OR
basename lacks "web100", OR the extracted local IP is whitelisted
(whitelist_full; membership on canonical forms). moreThanOneYear is a
per-archive constant in the reference (computed from the processed day,
embargo.go:272-277, or the archive basename, embargo.go:306-308 —
never per entry); this archive is dated 20170316 = the cutoff, so the
age arm fires for NO entry here. They are data in this script, not the
output of any routing implementation.

Deterministic output: fixed mtimes, gzip mtime=0, ustar format.
"""
import gzip
import io
import os
import tarfile

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "testdata")
BASE = "20170316T000000Z-mlab2-syd02-sidestream-0000"
DIRP = "2017/03/16/mlab2.syd02"
MTIME = 1489622400  # 2017-03-16T00:00:00Z

# (basename or dirname, is_dir, route) — route: "pub" | "priv" | None (dir)
ENTRIES = [
    (DIRP, True, None),                                     # leading dir
    ("20170316T00:00:00Z_173.205.3.38_0.web100", False, "pub"),    # v4 whitelisted
    ("20170316T01:00:00Z_9.9.9.9_0.web100", False, "priv"),        # v4 unlisted
    # non-canonical spelling of whitelisted 2001:4c08:2003:2::148 —
    # public under canonical-membership semantics (the documented,
    # intentional divergence from the reference's literal compare)
    ("20170316T02:00:00Z_2001:4c08:2003:2:0:0:0:148_0.web100", False, "pub"),
    # ::: quirk collapsing to the SAME whitelisted address
    ("20170316T03:00:00Z_2001:4c08:2003:2:::148_0.web100", False, "pub"),
    # ::: quirk collapsing to a valid but unlisted address
    ("20170316T04:00:00Z_2001:db8:dead:beef:::77_0.web100", False, "priv"),
    (DIRP + "/extra", True, None),                          # MID-STREAM dir
    ("20170316T05:00:00Z_not:an:ip_0.web100", False, "priv"),      # malformed IP
    ("20170316T06:00:00Z.web100", False, "priv"),                  # old-format name
    ("20170316T07:00:00Z_9.9.9.9_0.snaplog", False, "pub"),        # non-web100
    # entry dated a day before its archive: PRIVATE — the one-year age
    # decision is the ARCHIVE's (20170316, not < cutoff), and an entry's
    # own older timestamp must not publish it early
    ("20170315T23:00:00Z_9.9.9.9_0.web100", False, "priv"),
    ("20170316T08:00:00Z_2606:4700:4700:::1111_0.web100", False, "priv"),
]


def payload(i: int) -> bytes:
    return bytes((i * 7 + j) % 256 for j in range(100 + 13 * i))


def write_tgz(path: str, rows):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for i, name, is_dir in rows:
            ti = tarfile.TarInfo(name)
            ti.mtime = MTIME
            if is_dir:
                ti.type = tarfile.DIRTYPE
                ti.mode = 0o755
                t.addfile(ti)
            else:
                data = payload(i)
                ti.size = len(data)
                ti.mode = 0o644
                t.addfile(ti, io.BytesIO(data))
    with open(path, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as g:
            g.write(buf.getvalue())


def main():
    full, pub, priv = [], [], []
    for i, (name, is_dir, route) in enumerate(ENTRIES):
        path = name if is_dir else f"{DIRP}/{name}"
        full.append((i, path, is_dir))
        if route == "pub":
            pub.append((i, path, False))
        elif route == "priv":
            priv.append((i, path, False))
    write_tgz(os.path.join(OUT, BASE + ".tgz"), full)
    write_tgz(os.path.join(OUT, BASE + "-p.tgz"), pub)
    write_tgz(os.path.join(OUT, BASE + "-e.tgz"), priv)
    print(f"wrote {BASE}(.tgz|-p.tgz|-e.tgz): "
          f"{len(full)} entries, {len(pub)} public, {len(priv)} private")


if __name__ == "__main__":
    main()
