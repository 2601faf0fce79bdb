"""HTTP service surface (api.py): the reference FastAPI routes
(routes.py:256-392, 485-494) re-expressed on the stdlib server — submit,
poll, report store, metrics, cancel, 404/400 paths, traversal guard."""
import json
import threading
import time
import urllib.error
import urllib.request

import pytest


@pytest.fixture()
def server(ray_session, tmp_path):
    from bio_data_validation_ray.api import serve

    httpd = serve("127.0.0.1", 0, reports_dir=str(tmp_path / "reports"))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, httpd
    httpd.shutdown()
    httpd.validation_state.close()


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.status, json.loads(r.read())


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def _delete(base, path):
    req = urllib.request.Request(base + path, method="DELETE")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


class TestStaticEndpoints:
    def test_root_health_metrics(self, server):
        base, _ = server
        st, root = _get(base, "/")
        assert st == 200 and "service" in root
        st, health = _get(base, "/health")
        assert st == 200 and health["status"] == "healthy"
        with urllib.request.urlopen(base + "/metrics") as r:
            text = r.read().decode()
        assert "bdvr_validations_total" in text
        assert 'status="completed"' in text

    def test_unknown_path_404(self, server):
        base, _ = server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base, "/nope")
        assert ei.value.code == 404


class TestValidateLifecycle:
    def test_submit_poll_report_roundtrip(self, server):
        from bio_data_validation_ray.sources.transcripts import (
            ensure_transcripts)

        base, _ = server
        d = ensure_transcripts("sf0.001")
        st, sub = _post(base, "/api/v1/validate", {"input_dir": d})
        assert st == 200 and sub["status"] == "pending"
        vid = sub["validation_id"]
        deadline = time.time() + 120
        status = None
        while time.time() < deadline:
            _, status = _get(base, f"/api/v1/validate/{vid}")
            if status["status"] in ("completed", "failed"):
                break
            time.sleep(0.5)
        assert status["status"] == "completed", status
        assert status["final_decision"] == "rejected"  # seeded fixture
        # report store lists and serves the saved report
        _, listing = _get(base, "/api/v1/reports")
        names = [r["filename"] for r in listing["reports"]]
        assert status["report_file"] in names
        _, report = _get(base, f"/api/v1/reports/{status['report_file']}")
        assert report["final_decision"] == "rejected"

    def test_submit_bad_input_dir_400(self, server):
        base, _ = server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/api/v1/validate", {"input_dir": "/no/such/dir"})
        assert ei.value.code == 400

    def test_status_unknown_id_404(self, server):
        base, _ = server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base, "/api/v1/validate/" + "0" * 32)
        assert ei.value.code == 404

    def test_cancel_pending_then_cannot_cancel_done(self, server):
        from bio_data_validation_ray.sources.transcripts import (
            ensure_transcripts)

        base, httpd = server
        d = ensure_transcripts("sf0.001")
        # enqueue two: the second sits pending behind the first -> cancellable
        _, s1 = _post(base, "/api/v1/validate", {"input_dir": d})
        _, s2 = _post(base, "/api/v1/validate", {"input_dir": d})
        st, out = _delete(base, f"/api/v1/validate/{s2['validation_id']}")
        assert st == 200 and out["status"] == "cancelled"
        # wait for the first to finish, then cancelling it must 400
        deadline = time.time() + 120
        while time.time() < deadline:
            _, status = _get(base, f"/api/v1/validate/{s1['validation_id']}")
            if status["status"] in ("completed", "failed"):
                break
            time.sleep(0.5)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _delete(base, f"/api/v1/validate/{s1['validation_id']}")
        assert ei.value.code == 400
        # the cancelled task never ran
        _, st2 = _get(base, f"/api/v1/validate/{s2['validation_id']}")
        assert st2["status"] == "cancelled"

    def test_non_dict_json_body_is_400_not_dropped_connection(self, server):
        base, _ = server
        for body in (b"[1,2]", b'"x"', b"42"):
            req = urllib.request.Request(
                base + "/api/v1/validate", data=body,
                headers={"Content-Type": "application/json"},
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
            assert "JSON object" in json.loads(ei.value.read())["detail"]

    def test_terminal_task_eviction_bounds_registry(self, server):
        from bio_data_validation_ray.api import ValidationServer

        _, httpd = server
        st: ValidationServer = httpd.validation_state
        st.max_tasks = 5
        with st._lock:
            for i in range(8):
                st.tasks[f"{i:032x}"] = {"status": "completed",
                                         "submitted_at": float(i)}
            st.tasks["f" * 32] = {"status": "running",
                                  "submitted_at": 0.0}
            st._evict_terminal_locked()
            # oldest terminal entries evicted, running survives
            assert "f" * 32 in st.tasks
            assert len(st.tasks) <= 6
            assert f"{0:032x}" not in st.tasks

    def test_report_traversal_guard(self, server):
        base, _ = server
        for bad in ("..%2F..%2Fetc%2Fpasswd", "validation_..js.json",
                    "notvalidation.json"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _get(base, f"/api/v1/reports/{bad}")
            assert ei.value.code == 404
