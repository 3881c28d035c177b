"""FastVideo Studio web UI — single-file page over the Studio HTTP API.

Minimal stand-in for the reference's Next.js frontend
(/root/reference/apps/fastvideo_studio/): job list with live status +
logs, job creation from registered models/workloads, dataset management.
No build step, no external assets; everything rides the JSON API that
apps/studio/server.py already exposes.
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>FastVideo Studio</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  :root {
    --bg: #f6f5f2; --panel: #ffffff; --ink: #1f1e1b; --muted: #6f6b63;
    --line: #e4e1da; --accent: #2f6f6d; --accent-ink: #ffffff;
    --bad: #a33a2e; --ok: #2f6f3e;
  }
  @media (prefers-color-scheme: dark) {
    :root {
      --bg: #161513; --panel: #201f1c; --ink: #eceae5; --muted: #9b968c;
      --line: #353330; --accent: #6fb3b0; --accent-ink: #10211f;
      --bad: #e07a6b; --ok: #83c08e;
    }
  }
  * { box-sizing: border-box; }
  body { margin: 0; background: var(--bg); color: var(--ink);
         font: 14px/1.5 system-ui, sans-serif; }
  header { padding: 14px 24px; border-bottom: 1px solid var(--line);
           display: flex; align-items: baseline; gap: 12px; }
  header h1 { font-size: 16px; margin: 0; }
  header span { color: var(--muted); font-size: 12px; }
  main { max-width: 1100px; margin: 0 auto; padding: 20px;
         display: grid; gap: 20px; grid-template-columns: 1fr 1fr; }
  section { background: var(--panel); border: 1px solid var(--line);
            border-radius: 8px; padding: 16px; }
  section.wide { grid-column: 1 / -1; }
  h2 { font-size: 13px; margin: 0 0 10px; text-transform: uppercase;
       letter-spacing: .06em; color: var(--muted); }
  table { width: 100%; border-collapse: collapse; }
  th, td { text-align: left; padding: 6px 8px;
           border-bottom: 1px solid var(--line); }
  th { color: var(--muted); font-weight: 500; font-size: 12px; }
  .status-running { color: var(--accent); }
  .status-finished { color: var(--ok); }
  .status-failed { color: var(--bad); }
  button { background: var(--accent); color: var(--accent-ink);
           border: 0; border-radius: 6px; padding: 6px 12px;
           cursor: pointer; font: inherit; }
  button.ghost { background: transparent; color: var(--accent);
                 border: 1px solid var(--line); }
  input, select { background: var(--bg); color: var(--ink);
                  border: 1px solid var(--line); border-radius: 6px;
                  padding: 6px 8px; font: inherit; width: 100%; }
  form { display: grid; gap: 8px; }
  label { font-size: 12px; color: var(--muted); }
  pre { background: var(--bg); border: 1px solid var(--line);
        border-radius: 6px; padding: 10px; max-height: 280px;
        overflow: auto; font-size: 12px; white-space: pre-wrap; }
  .row { display: flex; gap: 8px; align-items: center; }
</style>
</head>
<body>
<header><h1>FastVideo Studio</h1><span id="meta"></span></header>
<main>
  <section class="wide">
    <h2>Training jobs</h2>
    <table>
      <thead><tr><th>name</th><th>model</th><th>method</th><th>status</th>
        <th>step</th><th></th></tr></thead>
      <tbody id="jobs"></tbody>
    </table>
  </section>
  <section>
    <h2>New job</h2>
    <form id="newjob">
      <label>name <input name="name" required placeholder="my-finetune"></label>
      <label>model <select name="model" id="models"></select></label>
      <label>method <select name="workload" id="workloads"></select></label>
      <label>dataset <select name="dataset_id" id="dsopts"></select></label>
      <label>steps <input name="max_steps" type="number" value="1000"></label>
      <div class="row"><button type="submit">Create job</button></div>
    </form>
  </section>
  <section>
    <h2>Datasets</h2>
    <table><tbody id="datasets"></tbody></table>
    <form id="newds" class="row" style="margin-top:10px">
      <input name="name" placeholder="dataset name" required>
      <input name="path" placeholder="/path/to/videos" required>
      <button type="submit">Add</button>
    </form>
  </section>
  <section class="wide">
    <h2>Logs <span id="logtitle"></span></h2>
    <pre id="logs">select a job to tail its logs</pre>
  </section>
</main>
<script>
const $ = (s) => document.querySelector(s);
const api = async (path, opts) => {
  const r = await fetch(path, opts);
  if (!r.ok) throw new Error((await r.json()).error || r.statusText);
  return r.json();
};
let currentLogJob = null;

async function refresh() {
  try {
    const [jobsR, dsR, gpus] = await Promise.all([
      api('/api/jobs'), api('/api/datasets'), api('/api/gpus')]);
    const jobs = jobsR.jobs || [], datasets = dsR.datasets || [];
    $('#meta').textContent =
      (gpus.devices || []).map(d => d.kind).join(', ') || 'no devices';
    $('#jobs').innerHTML = jobs.map(j => `
      <tr><td>${j.name}</td><td>${j.model_id || ''}</td>
      <td>${j.workload_type || ''}</td>
      <td class="status-${j.status}">${j.status}</td>
      <td>${j.step ?? ''}</td>
      <td class="row">
        <button class="ghost" onclick="act('${j.id}','start')">start</button>
        <button class="ghost" onclick="act('${j.id}','stop')">stop</button>
        <button class="ghost" onclick="tail('${j.id}','${j.name}')">logs</button>
      </td></tr>`).join('');
    $('#datasets').innerHTML = datasets.map(d =>
      `<tr><td>${d.name}</td><td>${d.num_videos ?? ''} videos</td>
       <td>${d.path || ''}</td></tr>`).join('');
    $('#dsopts').innerHTML = '<option value="">none</option>' +
      datasets.map(d => `<option value="${d.id}">${d.name}</option>`).join('');
    if (currentLogJob) tail(currentLogJob.id, currentLogJob.name, true);
  } catch (e) { $('#meta').textContent = e.message; }
}

async function loadStatic() {
  const [modelsR, workloadsR] = await Promise.all([
    api('/api/models'), api('/api/workloads')]);
  $('#models').innerHTML = (modelsR.models || []).map(m =>
    `<option value="${m.id}">${m.name || m.id}</option>`).join('');
  $('#workloads').innerHTML = (workloadsR.workloads || []).map(w =>
    `<option value="${w}">${w}</option>`).join('');
}

window.act = async (id, action) => {
  try { await api(`/api/jobs/${id}/${action}`, {method: 'POST'}); }
  catch (e) { alert(e.message); }
  refresh();
};
window.tail = async (id, name, quiet) => {
  currentLogJob = {id, name};
  try {
    const res = await api(`/api/jobs/${id}/logs`);
    $('#logtitle').textContent = '— ' + name;
    $('#logs').textContent = (res.lines || res.logs || []).join
      ? (res.lines || res.logs).join('\\n') : JSON.stringify(res);
  } catch (e) { if (!quiet) $('#logs').textContent = e.message; }
};
$('#newjob').addEventListener('submit', async (ev) => {
  ev.preventDefault();
  const f = Object.fromEntries(new FormData(ev.target));
  // server contract (studio/server.py _create_job): flat {name, job_type}
  // + nested config {workload_type, model_id, dataset_id, max_steps}
  const body = {name: f.name, job_type: 'training', config: {
    workload_type: f.workload, model_id: f.model,
    dataset_id: f.dataset_id || undefined,
    max_steps: f.max_steps ? +f.max_steps : undefined}};
  try { await api('/api/jobs', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(body)}); ev.target.reset(); }
  catch (e) { alert(e.message); }
  refresh();
});
$('#newds').addEventListener('submit', async (ev) => {
  ev.preventDefault();
  const body = Object.fromEntries(new FormData(ev.target));
  try { await api('/api/datasets', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(body)}); ev.target.reset(); }
  catch (e) { alert(e.message); }
  refresh();
});
loadStatic(); refresh(); setInterval(refresh, 4000);
</script>
</body>
</html>
"""
