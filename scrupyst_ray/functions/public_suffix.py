"""Minimal public-suffix check for the cookie Domain guard.

The reference rejects ``Set-Cookie`` headers whose ``Domain`` attribute is a
public suffix (``scrapy/downloadermiddlewares/cookies.py:35-37,64-72``) using
tldextract's bundled snapshot of the Mozilla Public Suffix List.  tldextract
is absent in this environment, so this module carries the MECHANISM plus a
small bundled SNAPSHOT of well-known entries from the public list
(publicsuffix.org — public data):

- every single-label domain (``com``, ``org``, any TLD) is a public suffix —
  true by construction of the PSL;
- a curated set of common multi-label registry suffixes (``co.uk``,
  ``com.au``, …) and private-section hosting suffixes (``github.io``, …).

This is NOT the full list (thousands of entries); swap :func:`is_public_suffix`
for ``tldextract`` when the library appears (COVERAGE.md env-blocked table).
A miss here fails OPEN (the cookie is accepted like any normal domain), which
only matters for hostile Set-Cookie targeting an exotic registry suffix.
"""

from __future__ import annotations

# Common multi-label entries of the Public Suffix List (subset; lowercase).
PSL_SNAPSHOT: frozenset[str] = frozenset(
    """
    co.uk org.uk ac.uk gov.uk me.uk net.uk ltd.uk plc.uk sch.uk
    com.au net.au org.au edu.au gov.au asn.au id.au
    co.jp ne.jp or.jp ac.jp go.jp ad.jp ed.jp gr.jp lg.jp
    co.kr ne.kr or.kr re.kr go.kr ac.kr
    com.br net.br org.br gov.br edu.br
    com.cn net.cn org.cn gov.cn edu.cn ac.cn
    com.mx org.mx net.mx gob.mx edu.mx
    co.in net.in org.in firm.in gen.in ind.in ac.in edu.in gov.in
    co.nz net.nz org.nz govt.nz ac.nz school.nz
    com.sg net.sg org.sg edu.sg gov.sg
    com.tw net.tw org.tw edu.tw gov.tw idv.tw
    co.za net.za org.za web.za ac.za gov.za
    com.ar net.ar org.ar edu.ar gob.ar
    com.tr net.tr org.tr edu.tr gov.tr
    co.il org.il net.il ac.il gov.il muni.il
    com.hk net.hk org.hk edu.hk gov.hk
    com.my net.my org.my edu.my gov.my
    com.ph net.ph org.ph
    com.pl net.pl org.pl edu.pl
    com.vn net.vn org.vn edu.vn gov.vn
    co.th ac.th go.th or.th in.th
    com.eg net.eg org.eg edu.eg gov.eg
    com.sa net.sa org.sa edu.sa gov.sa
    co.id net.id or.id ac.id web.id sch.id go.id
    com.ua net.ua org.ua edu.ua gov.ua in.ua
    com.ng net.ng org.ng edu.ng gov.ng
    co.ke or.ke ne.ke ac.ke go.ke
    github.io gitlab.io herokuapp.com appspot.com blogspot.com
    netlify.app vercel.app pages.dev web.app firebaseapp.com
    azurewebsites.net cloudapp.net s3.amazonaws.com elasticbeanstalk.com
    """.split()
)


def is_public_suffix(domain: str) -> bool:
    """True if *domain* (leading dot ignored, case-insensitive) is a public
    suffix per the bundled snapshot rules."""
    d = domain.lstrip(".").rstrip(".").lower()
    if not d:
        return False
    if "." not in d:
        return True  # every TLD is a public suffix
    return d in PSL_SNAPSHOT
