"""TSTLookup — ternary search tree autocomplete with its traversal-order
quirks.

Reference: suggest/src/java/org/apache/lucene/search/suggest/tst/
TSTLookup.java + TSTAutocomplete.java + Lookup.LookupPriorityQueue:

- build sorts entries in UTF-16 CODE-UNIT order (TSTLookup.java:20-37 —
  utf8SortedAsUTF16SortOrder; supplementary characters order BELOW
  U+E000..U+FFFF, unlike UTF-8 byte order) and balanced-inserts the
  middle element first (TSTAutocomplete.balancedTree) into a DUMMY root
  whose splitchar is '\\0' — the real tree hangs off root.hiKid;
- prefixCompletion (TSTAutocomplete.java:70-108) walks to the prefix
  node, then traverses with an explicit stack pushing (eq, lo, hi) —
  so the HI child pops FIRST: completions come back in a tree-shape-
  dependent order, NOT sorted order (pinned in tests/test_tst.py);
- lookup with onlyMorePopular=false returns the FIRST num nodes of that
  traversal (TSTLookup.java:lookup); with true, a size-num min-heap on
  the value (LookupPriorityQueue — insertWithOverflow rejects only when
  strictly less than the top, so a tie with the current minimum EVICTS
  it) yields the top weights in descending order.

The heap is ported operation-for-operation (Lucene util/PriorityQueue
upHeap/downHeap with a strict lessThan) so tie behavior is
insertion-order faithful.
"""

from __future__ import annotations


class _Node:
    __slots__ = ("splitchar", "lo", "eq", "hi", "token", "val")

    def __init__(self, splitchar="\0"):
        self.splitchar = splitchar
        self.lo = self.eq = self.hi = None
        self.token = None
        self.val = None


def _utf16_key(s: str) -> bytes:
    return s.encode("utf-16-be", "surrogatepass")


class TSTLookup:
    def __init__(self, entries):
        """``entries``: iterable of (key, weight).  Sorted UTF-16 then
        balanced-inserted, exactly TSTLookup.build."""
        items = sorted(entries, key=lambda kv: _utf16_key(kv[0]))
        self.count = len(items)
        self.root = _Node()
        tokens = [k for k, _ in items]
        vals = [v for _, v in items]
        self._balanced(tokens, vals, 0, len(items) - 1)

    def _balanced(self, tokens, vals, lo, hi):
        if lo > hi:
            return
        mid = (lo + hi) // 2
        self._insert(self.root, tokens[mid], vals[mid], 0)
        self._balanced(tokens, vals, lo, mid - 1)
        self._balanced(tokens, vals, mid + 1, hi)

    def _insert(self, node, s, val, x):
        if s is None or len(s) <= x:
            return node
        if node is None:
            node = _Node(s[x])
            if x < len(s) - 1:
                node.eq = self._insert(node.eq, s, val, x + 1)
            else:
                node.token = s
                node.val = val
            return node
        if node.splitchar > s[x]:
            node.lo = self._insert(node.lo, s, val, x)
        elif node.splitchar == s[x]:
            if x < len(s) - 1:
                node.eq = self._insert(node.eq, s, val, x + 1)
            else:
                node.token = s
                node.val = val
        else:
            node.hi = self._insert(node.hi, s, val, x)
        return node

    def _prefix_completion(self, s):
        p = self.root
        x = 0
        while p is not None:
            if s[x] < p.splitchar:
                p = p.lo
            elif s[x] == p.splitchar:
                if x == len(s) - 1:
                    break
                x += 1
                p = p.eq
            else:
                p = p.hi
        suggest = []
        if p is None:
            return suggest
        if p.eq is None and p.token is None:
            return suggest
        if p.eq is None and p.token is not None:
            suggest.append(p)
            return suggest
        if p.token is not None:
            suggest.append(p)
        p = p.eq
        st = [p]
        while st:
            top = st.pop()
            if top.token is not None:
                suggest.append(top)
            if top.eq is not None:
                st.append(top.eq)
            if top.lo is not None:
                st.append(top.lo)
            if top.hi is not None:
                st.append(top.hi)
        return suggest

    def lookup(self, key: str, num: int,
               only_more_popular: bool = False) -> list[tuple[str, int]]:
        nodes = self._prefix_completion(key)
        if not nodes:
            return []
        if only_more_popular:
            q = _LookupQueue(num)
            for n in nodes:
                q.insert_with_overflow((n.token, int(n.val)))
            return q.results()
        return [(n.token, int(n.val)) for n in nodes[: min(num, len(nodes))]]


class _LookupQueue:
    """Lucene util/PriorityQueue min-heap keyed by value, strict lessThan
    (Lookup.LookupPriorityQueue); getResults pops ascending into a
    descending array."""

    def __init__(self, size):
        self.max_size = size
        self.heap = [None] * (size + 1)
        self.size = 0

    @staticmethod
    def _less(a, b):
        return a[1] < b[1]

    def insert_with_overflow(self, el):
        if self.size < self.max_size:
            self.size += 1
            self.heap[self.size] = el
            self._up(self.size)
        elif self.size > 0 and not self._less(el, self.heap[1]):
            old = self.heap[1]
            self.heap[1] = el
            self._down(1)
            return old
        return None

    def _up(self, i):
        node = self.heap[i]
        j = i >> 1
        while j > 0 and self._less(node, self.heap[j]):
            self.heap[i] = self.heap[j]
            i = j
            j >>= 1
        self.heap[i] = node

    def _down(self, i):
        node = self.heap[i]
        j = i << 1
        k = j + 1
        if k <= self.size and self._less(self.heap[k], self.heap[j]):
            j = k
        while j <= self.size and self._less(self.heap[j], node):
            self.heap[i] = self.heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= self.size and self._less(self.heap[k], self.heap[j]):
                j = k
        self.heap[i] = node

    def pop(self):
        if self.size == 0:
            return None
        out = self.heap[1]
        self.heap[1] = self.heap[self.size]
        self.heap[self.size] = None
        self.size -= 1
        self._down(1)
        return out

    def results(self):
        n = self.size
        out = [None] * n
        for i in range(n - 1, -1, -1):
            out[i] = self.pop()
        return out


class _JNode:
    __slots__ = ("splitchar", "lo", "eq", "hi", "parent", "data")

    def __init__(self, splitchar, parent):
        self.splitchar = splitchar
        self.lo = self.eq = self.hi = None
        self.parent = parent
        self.data = None


def _jcmp(a: str, b: str) -> int:
    """JaspellTernarySearchTrie.compareCharsAlphabetically (:110-112):
    CASE-INSENSITIVE char comparison — 'Apple' and 'apple' share paths, so
    keys canonicalize to the FIRST-SEEN casing along shared prefixes."""
    return ord(a.lower()) - ord(b.lower())


class JaspellLookup:
    """JaspellLookup + JaspellTernarySearchTrie (suggest/jaspell):
    insertion-order unbalanced ternary trie with case-folded ordering;
    matchPrefix returns keys in case-insensitive SORTED order (in-order
    lo→self→eq→hi with the cutoff checked between the lo recursion and
    the self-visit), keys reconstructed from stored splitchars
    (first-seen casing); onlyMorePopular heaps the first 2·num sorted
    completions by weight (JaspellLookup.java:lookup — the popular cut
    never sees completions beyond that window)."""

    def __init__(self, entries):
        self.root = None
        self.count = 0
        for k, v in entries:
            if not k:
                continue  # build() skips empty keys
            self._get_or_create(k).data = int(v)
            self.count += 1

    def _get_or_create(self, key):
        if self.root is None:
            self.root = _JNode(key[0], None)
        node = self.root
        i = 0
        while True:
            c = _jcmp(key[i], node.splitchar)
            if c == 0:
                i += 1
                if i == len(key):
                    return node
                if node.eq is None:
                    node.eq = _JNode(key[i], node)
                node = node.eq
            elif c < 0:
                if node.lo is None:
                    node.lo = _JNode(key[i], node)
                node = node.lo
            else:
                if node.hi is None:
                    node.hi = _JNode(key[i], node)
                node = node.hi

    def _get_node(self, key):
        node = self.root
        i = 0
        while True:
            if node is None or not key:
                return None
            c = _jcmp(key[i], node.splitchar)
            if c == 0:
                i += 1
                if i == len(key):
                    return node
                node = node.eq
            elif c < 0:
                node = node.lo
            else:
                node = node.hi

    @staticmethod
    def _key_of(node):
        buf = [node.splitchar]
        cur = node.parent
        last = node
        while cur is not None:
            if cur.eq is last:
                buf.append(cur.splitchar)
            last = cur
            cur = cur.parent
        return "".join(reversed(buf))

    def _sort_keys(self, node, num, out):
        if node is None:
            return out
        self._sort_keys(node.lo, num, out)
        if num != -1 and len(out) >= num:
            return out
        if node.data is not None:
            out.append(self._key_of(node))
        self._sort_keys(node.eq, num, out)
        return self._sort_keys(node.hi, num, out)

    def match_prefix(self, prefix, num):
        out: list[str] = []
        start = self._get_node(prefix)
        if start is None:
            return out
        if start.data is not None:
            out.append(self._key_of(start))
        return self._sort_keys(start.eq, num, out)

    def lookup(self, key: str, num: int,
               only_more_popular: bool = False) -> list[tuple[str, int]]:
        count = num * 2 if only_more_popular else num
        lst = self.match_prefix(key, count)
        if not lst:
            return []
        if only_more_popular:
            q = _LookupQueue(num)
            for s in lst:
                q.insert_with_overflow((s, int(self._get_node(s).data)))
            return q.results()
        return [(s, int(self._get_node(s).data))
                for s in lst[: min(num, len(lst))]]
