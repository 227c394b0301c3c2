"""Minimal mutable element tree with lxml-compatible mutation semantics.

The reference engine's tree walk (sanitizer.py:303-426) relies on the exact
behavior of lxml's ``drop_tag`` / ``drop_tree`` / sibling navigation /
``text``-vs-``tail`` split. This is an original, dependency-free tree whose
mutation semantics are contract-compatible with those lxml APIs for the
operations the sanitizer uses. Attribute order is insertion order (dict),
matching lxml's serialization order.
"""

from __future__ import annotations

from typing import Iterator, Optional

__all__ = ["Element"]


class Element:
    __slots__ = ("tag", "attrib", "text", "tail", "_children", "_parent")

    def __init__(self, tag: str, attrib: Optional[dict] = None):
        self.tag = tag
        self.attrib: dict[str, str] = dict(attrib) if attrib else {}
        self.text: Optional[str] = None
        self.tail: Optional[str] = None
        self._children: list[Element] = []
        self._parent: Optional[Element] = None

    # --- container protocol (subset of lxml's) ---

    def __len__(self) -> int:
        return len(self._children)

    def __iter__(self) -> Iterator["Element"]:
        # Iterate over a snapshot: lxml's child iterator pre-fetches the next
        # sibling before yielding, so loops that re-parent the current child
        # (e.g. the merge step, sanitizer.py:397-398) still visit every child.
        return iter(list(self._children))

    def __getitem__(self, idx):
        return self._children[idx]

    def __bool__(self) -> bool:  # match lxml: truthiness != has-children dance
        return True

    def keys(self):
        return list(self.attrib.keys())

    def get(self, key: str, default=None):
        return self.attrib.get(key, default)

    def set(self, key: str, value: str) -> None:
        self.attrib[key] = value

    # --- navigation ---

    def getparent(self) -> Optional["Element"]:
        return self._parent

    def getprevious(self) -> Optional["Element"]:
        p = self._parent
        if p is None:
            return None
        i = p._children.index(self)
        return p._children[i - 1] if i > 0 else None

    def getnext(self) -> Optional["Element"]:
        p = self._parent
        if p is None:
            return None
        i = p._children.index(self)
        return p._children[i + 1] if i + 1 < len(p._children) else None

    def iterdescendants(self) -> Iterator["Element"]:
        """Preorder (document order) walk, self excluded — the traversal the
        sanitizer snapshots into its work deque (sanitizer.py:303)."""
        return iter(self.descendants_list())

    def descendants_list(self) -> list["Element"]:
        """Preorder descendants as a list (the hot-path form: the walk and
        cleaner passes snapshot the whole traversal anyway, and a plain
        loop beats generator resumption per node)."""
        out: list[Element] = []
        stack = list(reversed(self._children))
        pop = stack.pop
        append = out.append
        extend = stack.extend
        while stack:
            node = pop()
            append(node)
            kids = node._children
            if kids:
                extend(reversed(kids))
        return out

    def findall(self, tag: str) -> list["Element"]:
        """Direct children with the given tag (the only path form the
        reference uses: ``element.findall("p")``, sanitizer.py:341)."""
        return [c for c in self._children if c.tag == tag]

    # --- structural mutation ---

    def append(self, child: "Element") -> None:
        if child._parent is not None:
            child._parent._children.remove(child)
        child._parent = self
        self._children.append(child)

    def insert(self, idx: int, child: "Element") -> None:
        if child._parent is not None:
            child._parent._children.remove(child)
        child._parent = self
        self._children.insert(idx, child)

    def remove(self, child: "Element") -> None:
        """Detach child, keeping its tail text attached to nothing — exactly
        lxml's ``remove`` (used for the merged-away sibling,
        sanitizer.py:402)."""
        self._children.remove(child)
        child._parent = None

    def index(self, child: "Element") -> int:
        return self._children.index(child)

    def drop_tag(self) -> None:
        """Remove this element, preserving its text, tail and children in
        place (lxml ``drop_tag`` contract; heavily relied on by the empty-drop
        and unwrap steps, sanitizer.py:326,344,363,369)."""
        parent = self._parent
        assert parent is not None
        prev = self.getprevious()
        if self.text:
            if prev is None:
                parent.text = (parent.text or "") + self.text
            else:
                prev.tail = (prev.tail or "") + self.text
        if self.tail:
            if self._children:
                last = self._children[-1]
                last.tail = (last.tail or "") + self.tail
            elif prev is None:
                parent.text = (parent.text or "") + self.tail
            else:
                prev.tail = (prev.tail or "") + self.tail
        idx = parent._children.index(self)
        kids = self._children
        for k in kids:
            k._parent = parent
        parent._children[idx : idx + 1] = kids
        self._children = []
        self._parent = None

    def drop_tree(self) -> None:
        """Remove this element and its whole subtree, preserving only the
        tail (lxml ``drop_tree`` contract; the whitespace-subtree drop,
        sanitizer.py:336)."""
        parent = self._parent
        assert parent is not None
        prev = self.getprevious()
        if self.tail:
            if prev is None:
                parent.text = (parent.text or "") + self.tail
            else:
                prev.tail = (prev.tail or "") + self.tail
        parent.remove(self)

    def __repr__(self) -> str:  # debugging aid only
        return f"<Element {self.tag} attrs={self.attrib} text={self.text!r} tail={self.tail!r} kids={len(self._children)}>"
