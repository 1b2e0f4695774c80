"""Independent reference BPE trainer (pure-Python dicts, no library imports).

Spec shared with ocr_ray.ops.bpe (written against the spec, not the code):
* word census over lowercased whitespace tokens;
* pair census counts EVERY adjacent symbol position (overlaps included),
  weighted by word count;
* winner = max count, ties broken by (left, right) ascending string order;
* merge applies left-to-right non-overlapping within each word.
"""

from collections import Counter


def ref_bpe_merges(words, n_merges):
    wc = Counter(w.lower() for w in words if w)
    segs = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        census = Counter()
        for w, n in wc.items():
            s = segs[w]
            for i in range(len(s) - 1):
                census[(s[i], s[i + 1])] += n
        if not census:
            break
        best_n = max(census.values())
        left, right = min(p for p, c in census.items() if c == best_n)
        merges.append((left, right, best_n))
        z = left + right
        for w in wc:
            s = segs[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(z)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges
