"""EventBus and HookManager tests."""

from framewright_tpu.events import Event, EventBus, EventType, HookManager, HookPoint


class TestEventBus:
    def test_subscribe_and_emit(self):
        bus = EventBus()
        seen = []
        bus.subscribe(lambda e: seen.append(e), EventType.PROGRESS)
        bus.emit(EventType.PROGRESS, frame=5, pct=0.5)
        bus.emit(EventType.JOB_STARTED)
        assert len(seen) == 1
        assert seen[0].data["frame"] == 5

    def test_wildcard_subscription(self):
        bus = EventBus()
        seen = []
        bus.subscribe(lambda e: seen.append(e.type))
        bus.emit(EventType.JOB_STARTED)
        bus.emit(EventType.STAGE_COMPLETED, stage="sr")
        assert seen == [EventType.JOB_STARTED, EventType.STAGE_COMPLETED]

    def test_predicate_filter(self):
        bus = EventBus()
        seen = []
        bus.subscribe(
            lambda e: seen.append(e),
            EventType.PROGRESS,
            predicate=lambda e: e.data.get("pct", 0) > 0.5,
        )
        bus.emit(EventType.PROGRESS, pct=0.2)
        bus.emit(EventType.PROGRESS, pct=0.9)
        assert len(seen) == 1

    def test_unsubscribe(self):
        bus = EventBus()
        seen = []
        unsub = bus.subscribe(lambda e: seen.append(e), EventType.PROGRESS)
        bus.emit(EventType.PROGRESS)
        unsub()
        bus.emit(EventType.PROGRESS)
        assert len(seen) == 1

    def test_subscriber_exception_isolated(self):
        bus = EventBus()
        seen = []

        def bad(e):
            raise RuntimeError("bad subscriber")

        bus.subscribe(bad, EventType.PROGRESS)
        bus.subscribe(lambda e: seen.append(e), EventType.PROGRESS)
        bus.emit(EventType.PROGRESS)
        assert len(seen) == 1

    def test_history(self):
        bus = EventBus()
        bus.emit(EventType.JOB_STARTED)
        bus.emit(EventType.PROGRESS)
        assert len(bus.history()) == 2
        assert len(bus.history(EventType.PROGRESS)) == 1


class TestHooks:
    def test_fire_order_by_priority(self):
        hm = HookManager()
        order = []
        hm.register(HookPoint.PRE_STAGE, lambda ctx: order.append("b"), priority=60)
        hm.register(HookPoint.PRE_STAGE, lambda ctx: order.append("a"), priority=10)
        hm.fire(HookPoint.PRE_STAGE, {})
        assert order == ["a", "b"]

    def test_context_mutation(self):
        hm = HookManager()
        hm.register(HookPoint.PRE_FRAME_BATCH, lambda ctx: ctx.update(x=1))
        out = hm.fire(HookPoint.PRE_FRAME_BATCH, {})
        assert out["x"] == 1

    def test_hook_exception_isolated(self):
        hm = HookManager()
        hm.register(HookPoint.ON_ERROR, lambda ctx: 1 / 0)
        hm.register(HookPoint.ON_ERROR, lambda ctx: ctx.update(ok=True))
        assert hm.fire(HookPoint.ON_ERROR, {})["ok"] is True

    def test_count(self):
        hm = HookManager()
        hm.register(HookPoint.PRE_STAGE, lambda ctx: None)
        assert hm.count(HookPoint.PRE_STAGE) == 1
        assert hm.count() == 1
