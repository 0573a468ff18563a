"""HTML dashboard for the status server (reference webserver UI twin).

The reference ships a React/Bootstrap pipeline dashboard
(motorway/templates/index.html + app.jsx) rendering the
``/api/status/`` payload: process groups with waiting counts,
success/failure histograms, average/95th-percentile latency, and a
busy/overloaded state light, with a per-process detail drill-down
(templates/detail.html). This is the same view as ONE dependency-free
page — no CDN scripts (the reference pulls jquery/React from the
network; a driver-side debug endpoint should render offline), no build
step: vanilla JS polls ``/api/status/`` every 2 s and renders the
groups; clicking a process fetches ``/api/detail/<name>/``.

Served by ``StatusServer`` at ``GET /``.
"""

DASHBOARD_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8"/>
<title>Pipeline Stats</title>
<style>
  body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
         margin: 0; background: #f4f5f7; color: #172b4d; }
  header { background: #172b4d; color: #fff; padding: 10px 20px;
           display: flex; justify-content: space-between; align-items: baseline; }
  header h1 { font-size: 18px; margin: 0; }
  #conn { font-size: 12px; }
  #conn.down { color: #ff5630; font-weight: bold; }
  main { padding: 16px 20px; }
  .group { background: #fff; border-radius: 6px; margin-bottom: 14px;
           box-shadow: 0 1px 2px rgba(9,30,66,.15); overflow: hidden; }
  .group > h2 { font-size: 14px; margin: 0; padding: 8px 14px;
                background: #fafbfc; border-bottom: 1px solid #ebecf0;
                display: flex; justify-content: space-between; }
  .group > h2 .rollup { font-weight: normal; color: #6b778c; font-size: 12px; }
  table { width: 100%; border-collapse: collapse; font-size: 13px; }
  th, td { text-align: left; padding: 6px 14px; border-bottom: 1px solid #f0f1f3; }
  th { color: #6b778c; font-weight: 600; font-size: 11px; text-transform: uppercase; }
  tr.proc { cursor: pointer; }
  tr.proc:hover { background: #f0f6ff; }
  .state { display: inline-block; padding: 1px 8px; border-radius: 10px;
           font-size: 11px; font-weight: 600; color: #fff; }
  .state.available { background: #36b37e; }
  .state.busy { background: #ffab00; }
  .state.overloaded { background: #ff5630; }
  .bars { display: flex; align-items: flex-end; gap: 1px; height: 24px; }
  .bars div { width: 7px; background: #36b37e; min-height: 1px; }
  .bars div.err { background: #ff5630; }
  #detail { position: fixed; top: 0; right: 0; width: 420px; height: 100%;
            background: #fff; box-shadow: -2px 0 8px rgba(9,30,66,.25);
            padding: 16px; overflow: auto; display: none; }
  #detail pre { background: #f4f5f7; padding: 8px; font-size: 11px;
                overflow: auto; }
  #detail .close { float: right; cursor: pointer; font-size: 18px; }
</style>
</head>
<body>
<header>
  <h1>Pipeline Stats</h1>
  <span id="conn">connecting&hellip;</span>
</header>
<main id="groups"></main>
<div id="detail">
  <span class="close" onclick="hideDetail()">&times;</span>
  <h2 id="detail-name"></h2>
  <pre id="detail-body"></pre>
</div>
<script>
function fmtMs(v) { return v >= 1000 ? (v/1000).toFixed(2)+' s' : v.toFixed(1)+' ms'; }

function minuteBars(hist, lastMinutes) {
  // trailing-5-minute success/error bars from the last_minutes slice
  var cells = '';
  var minutes = Object.keys(lastMinutes || {});
  minutes.sort(function(a, b) { return a - b; });
  minutes.forEach(function(m) {
    var b = lastMinutes[m] || {};
    var ok = b.success_count || 0, err = b.error_count || 0;
    var h = Math.min(24, Math.round(Math.log(1 + ok + err) * 6));
    cells += '<div class="' + (err > 0 ? 'err' : '') + '" style="height:' +
             h + 'px" title="minute ' + m + ': ' + ok + ' ok / ' + err + ' err"></div>';
  });
  return '<div class="bars">' + cells + '</div>';
}

function render(payload) {
  var root = document.getElementById('groups');
  var html = '';
  Object.keys(payload.groups).sort().forEach(function(gname) {
    var g = payload.groups[gname];
    html += '<div class="group"><h2><span>' + gname + '</span>' +
            '<span class="rollup">waiting ' + g.waiting +
            ' &middot; avg ' + fmtMs(g.avg_time_taken_ms) + '</span></h2>';
    html += '<table><tr><th>process</th><th>state</th><th>waiting</th>' +
            '<th>success</th><th>failed</th><th>rows</th><th>avg</th>' +
            '<th>p95</th><th>last 5 min</th></tr>';
    Object.keys(g.processes).sort().forEach(function(pname) {
      var p = g.processes[pname];
      html += '<tr class="proc" onclick="showDetail(\\'' + pname + '\\')">' +
              '<td>' + pname + '</td>' +
              '<td><span class="state ' + p.state + '">' + p.state + '</span></td>' +
              '<td>' + p.waiting + '</td>' +
              '<td>' + p.success + '</td>' +
              '<td>' + p.failed + '</td>' +
              '<td>' + p.rows + '</td>' +
              '<td>' + fmtMs(p.avg_time_taken_ms) + '</td>' +
              '<td>' + fmtMs(p['95_percentile_ms'] || 0) + '</td>' +
              '<td>' + minuteBars(p.histogram, (payload.last_minutes || {})[pname]) + '</td>' +
              '</tr>';
    });
    html += '</table></div>';
  });
  root.innerHTML = html || '<p>No queries reporting yet.</p>';
}

function poll() {
  fetch('/api/status/')
    .then(function(r) { return r.json(); })
    .then(function(payload) {
      document.getElementById('conn').textContent = 'live';
      document.getElementById('conn').className = '';
      render(payload);
    })
    .catch(function() {
      document.getElementById('conn').textContent = 'DISCONNECTED';
      document.getElementById('conn').className = 'down';
    });
}

function showDetail(name) {
  fetch('/api/detail/' + encodeURIComponent(name) + '/')
    .then(function(r) { return r.json(); })
    .then(function(d) {
      document.getElementById('detail-name').textContent = name;
      document.getElementById('detail-body').textContent =
        JSON.stringify(d, null, 2);
      document.getElementById('detail').style.display = 'block';
    });
}
function hideDetail() { document.getElementById('detail').style.display = 'none'; }

poll();
setInterval(poll, 2000);
</script>
</body>
</html>
"""
