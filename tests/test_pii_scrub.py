"""Unit coverage for T141 pii_scrub — a local per-row recomputation
independent of both the distributed plan and the DuckDB oracle, plus
kernel-level cases exercising patterns the synthetic injection never
produces (multiple hits per kind, adjacency, non-matches)."""

import hashlib
import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_pii_kernel_cases():
    from documentconvert_ray.stages import text as tx

    em = re.compile(tx.PII_EMAIL_RE)
    ph = re.compile(tx.PII_PHONE_RE)
    ip = re.compile(tx.PII_IP_RE)
    t = ("mail a.b+c%d@ex-ample.co.uk and x@y.io, call 123-456-7890 "
         "or 000-000-0000; hosts 1.2.3.4 255.255.255.255 not 1.2.3 "
         "nor 1234-567-8901 nor user@nodot")
    assert len(em.findall(t)) == 2
    assert len(ph.findall(t)) == 2
    assert len(ip.findall(t)) == 2
    red = ip.sub("<IP>", ph.sub("<PHONE>", em.sub("<EMAIL>", t)))
    assert "x@y.io" not in red and "1.2.3.4" not in red
    assert "user@nodot" in red  # dotless domain is not an email
    assert "1.2.3 " in red  # 3-octet non-IP untouched
    # phone inside the 4-digit-prefix run must NOT match (\b guard)
    assert "1234-567-8901" in red


def test_pii_scrub_matches_bruteforce(ray_session):
    from documentconvert_ray.pipelines import queries as Q
    from documentconvert_ray.stages import text as tx

    got = (Q.q_pii_scrub(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(docs)
    em = re.compile(tx.PII_EMAIL_RE)
    ph = re.compile(tx.PII_PHONE_RE)
    ip = re.compile(tx.PII_IP_RE)
    for row, (i, t) in zip(got.itertuples(index=False),
                           zip(docs["doc_id"], docs["text"])):
        a = tx.pii_augment(int(i), t or "")
        assert row.n_emails == len(em.findall(a))
        assert row.n_phones == len(ph.findall(a))
        assert row.n_ips == len(ip.findall(a))
        red = ip.sub("<IP>", ph.sub("<PHONE>", em.sub("<EMAIL>", a)))
        assert row.redacted_md5 == hashlib.md5(
            red.encode("utf-8")).hexdigest()
    # the injection covers every kind at this sf
    assert got["n_emails"].sum() > 0
    assert got["n_phones"].sum() > 0
    assert got["n_ips"].sum() > 0
