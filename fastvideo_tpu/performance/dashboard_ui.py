"""Performance dashboard web UI — single-file page over the dashboard API.

Minimal stand-in for the reference's dashboard frontend
(/root/reference/apps/performance_dashboard/): latest-summary stat tiles,
one e2e trend line chart per model/device cohort (hover tooltip + endpoint
label), and the raw records table. No build step; everything rides
/api/performance/* from performance/dashboard.py.
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>FastVideo performance</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  .viz-root {
    color-scheme: light;
    --surface-1: #fcfcfb;
    --panel: #ffffff;
    --text-primary: #0b0b0b;
    --text-secondary: #52514e;
    --line: #e7e6e2;
    --grid: #efeeea;
    --series-1: #2a78d6;
    --ok: #008300;
    --bad: #e34948;
  }
  @media (prefers-color-scheme: dark) {
    :root:where(:not([data-theme="light"])) .viz-root {
      color-scheme: dark;
      --surface-1: #1a1a19;
      --panel: #222120;
      --text-primary: #ffffff;
      --text-secondary: #c3c2b7;
      --line: #353432;
      --grid: #2a2928;
      --series-1: #3987e5;
      --ok: #83c08e;
      --bad: #e66767;
    }
  }
  * { box-sizing: border-box; }
  body.viz-root { margin: 0; background: var(--surface-1);
    color: var(--text-primary); font: 14px/1.5 system-ui, sans-serif; }
  header { padding: 14px 24px; border-bottom: 1px solid var(--line);
    display: flex; gap: 16px; align-items: baseline; flex-wrap: wrap; }
  header h1 { font-size: 16px; margin: 0; }
  header .filters { display: flex; gap: 8px; margin-left: auto; }
  select { background: var(--panel); color: var(--text-primary);
    border: 1px solid var(--line); border-radius: 6px; padding: 4px 8px; }
  main { max-width: 1100px; margin: 0 auto; padding: 20px;
    display: grid; gap: 16px; }
  .tiles { display: grid; gap: 12px;
    grid-template-columns: repeat(auto-fit, minmax(180px, 1fr)); }
  .tile { background: var(--panel); border: 1px solid var(--line);
    border-radius: 8px; padding: 14px 16px; }
  .tile .v { font-size: 26px; font-weight: 600; letter-spacing: -.01em; }
  .tile .k { color: var(--text-secondary); font-size: 12px; }
  .tile .d { font-size: 12px; }
  section { background: var(--panel); border: 1px solid var(--line);
    border-radius: 8px; padding: 16px; }
  h2 { font-size: 13px; margin: 0 0 8px; color: var(--text-secondary);
    text-transform: uppercase; letter-spacing: .06em; }
  svg text { font: 11px system-ui, sans-serif; fill: var(--text-secondary); }
  table { width: 100%; border-collapse: collapse; font-size: 13px; }
  th, td { text-align: left; padding: 5px 8px;
    border-bottom: 1px solid var(--line); }
  th { color: var(--text-secondary); font-weight: 500; font-size: 12px; }
  .pass { color: var(--ok); } .fail { color: var(--bad); }
  #tip { position: fixed; pointer-events: none; background: var(--panel);
    border: 1px solid var(--line); border-radius: 6px; padding: 6px 8px;
    font-size: 12px; display: none; box-shadow: 0 2px 8px rgb(0 0 0 / .12); }
</style>
</head>
<body class="viz-root" data-palette="#2a78d6">
<header>
  <h1>FastVideo performance</h1>
  <span id="sync" style="color:var(--text-secondary);font-size:12px"></span>
  <div class="filters">
    <select id="f-model"><option value="">all models</option></select>
    <select id="f-days">
      <option value="30">30 days</option>
      <option value="90" selected>90 days</option>
      <option value="365">1 year</option>
    </select>
  </div>
</header>
<main>
  <div class="tiles" id="tiles"></div>
  <div id="charts"></div>
  <section>
    <h2>Records</h2>
    <table>
      <thead><tr><th>time</th><th>model</th><th>device</th>
        <th>e2e s</th><th>denoise s</th><th>decode s</th><th>ok</th></tr>
      </thead>
      <tbody id="records"></tbody>
    </table>
  </section>
</main>
<div id="tip"></div>
<script>
const $ = (s) => document.querySelector(s);
const fmt = (v) => v == null ? '–' : (+v).toFixed(v >= 100 ? 0 : 2);
const api = async (p) => (await fetch(p)).json();

function lineChart(group, metric) {
  const pts = group.points
    .map((p, i) => ({i, v: p.metrics[metric], t: p.timestamp, ok: p.success}))
    .filter(p => p.v != null && isFinite(p.v));
  if (pts.length < 2) return '';
  const W = 1040, H = 180, L = 46, R = 80, T = 14, B = 24;
  const vmax = Math.max(...pts.map(p => p.v)), vmin = Math.min(0,
    Math.min(...pts.map(p => p.v)));
  const x = (i) => L + (W - L - R) * (i / (pts.length - 1));
  const y = (v) => T + (H - T - B) * (1 - (v - vmin) / (vmax - vmin || 1));
  const path = pts.map((p, k) =>
    (k ? 'L' : 'M') + x(k).toFixed(1) + ' ' + y(p.v).toFixed(1)).join(' ');
  const last = pts[pts.length - 1];
  const ticks = [vmin, (vmin + vmax) / 2, vmax];
  const data = encodeURIComponent(JSON.stringify(pts.map((p, k) =>
    ({t: p.t, v: p.v, x: +x(k).toFixed(1), y: +y(p.v).toFixed(1)}))));
  return `<section><h2>${group.model_id} · ${group.gpu_type} — ${metric}
    </h2>
    <svg viewBox="0 0 ${W} ${H}" data-pts="${data}" data-l="${L}"
         data-r="${R}" class="trend">
      ${ticks.map(v => `<line x1="${L}" x2="${W - R}" y1="${y(v)}"
         y2="${y(v)}" stroke="var(--grid)" stroke-width="1"/>
         <text x="${L - 6}" y="${y(v) + 4}" text-anchor="end">${fmt(v)}
         </text>`).join('')}
      <path d="${path}" fill="none" stroke="var(--series-1)"
        stroke-width="2" stroke-linejoin="round" stroke-linecap="round"/>
      <circle cx="${x(pts.length - 1)}" cy="${y(last.v)}" r="4"
        fill="var(--series-1)" stroke="var(--surface-1)" stroke-width="2"/>
      <text x="${x(pts.length - 1) + 10}" y="${y(last.v) + 4}"
        style="fill:var(--text-primary)">${fmt(last.v)}s</text>
      <circle class="hoverdot" r="4" fill="var(--series-1)"
        stroke="var(--surface-1)" stroke-width="2" opacity="0"/>
      <rect x="${L}" y="0" width="${W - L - R}" height="${H}"
        fill="transparent" class="hit"/>
    </svg></section>`;
}

function wireTooltips() {
  const tip = $('#tip');
  document.querySelectorAll('svg.trend').forEach(svg => {
    const pts = JSON.parse(decodeURIComponent(svg.dataset.pts));
    const hit = svg.querySelector('.hit'), dot = svg.querySelector('.hoverdot');
    hit.addEventListener('mousemove', (ev) => {
      const box = svg.getBoundingClientRect();
      const W = svg.viewBox.baseVal.width, L = +svg.dataset.l,
            R = +svg.dataset.r;
      const px = (ev.clientX - box.left) / box.width * W;
      const k = Math.round((px - L) / (W - L - R) * (pts.length - 1));
      const p = pts[Math.max(0, Math.min(pts.length - 1, k))];
      if (!p) return;
      dot.setAttribute('cx', p.x); dot.setAttribute('cy', p.y);
      dot.setAttribute('opacity', 1);
      tip.style.display = 'block';
      tip.style.left = (ev.clientX + 12) + 'px';
      tip.style.top = (ev.clientY + 12) + 'px';
      tip.textContent = `${(p.t || '').slice(0, 19)} — ${fmt(p.v)}s`;
    });
    hit.addEventListener('mouseleave', () => {
      tip.style.display = 'none'; dot.setAttribute('opacity', 0);
    });
  });
}

async function refresh() {
  const days = $('#f-days').value, model = $('#f-model').value;
  const qs = `?days=${days}` + (model ? `&model_id=${model}` : '');
  const [summary, trends, records] = await Promise.all([
    api('/api/performance/summary' + qs),
    api('/api/performance/trends' + qs),
    api('/api/performance/records' + qs)]);
  $('#sync').textContent = `${records.count} records`;
  const models = [...new Set(records.records.map(r => r.model_id))];
  const sel = $('#f-model');
  if (sel.options.length <= 1) {
    sel.innerHTML = '<option value="">all models</option>' + models.map(m =>
      `<option>${m}</option>`).join('');
    sel.value = model;
  }
  const cur = (r, k) => r.metrics && r.metrics[k] && r.metrics[k].current;
  $('#tiles').innerHTML = summary.rows.map(r => `
    <div class="tile">
      <div class="k">${r.model_id} · ${r.gpu_type}</div>
      <div class="v">${fmt(cur(r, 'e2e_s'))}s</div>
      <div class="d ${r.status}">${r.status}
        · denoise ${fmt(cur(r, 'dit_time_s'))}s
        · decode ${fmt(cur(r, 'vae_decode_time_s'))}s</div>
    </div>`).join('');
  $('#charts').innerHTML = trends.groups.map(g =>
    lineChart(g, 'e2e_s')).join('');
  wireTooltips();
  $('#records').innerHTML = records.records.slice(-60).reverse().map(r => `
    <tr><td>${(r.timestamp || '').slice(0, 19)}</td><td>${r.model_id}</td>
    <td>${r.gpu_type}</td><td>${fmt(r.e2e_s)}</td>
    <td>${fmt(r.dit_time_s)}</td><td>${fmt(r.vae_decode_time_s)}</td>
    <td class="${r.success === false ? 'fail' : 'pass'}">
      ${r.success === false ? 'fail' : 'ok'}</td></tr>`).join('');
}
$('#f-days').addEventListener('change', refresh);
$('#f-model').addEventListener('change', refresh);
refresh(); setInterval(refresh, 15000);
</script>
</body>
</html>
"""
