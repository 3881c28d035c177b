"""Dreamverse web client — single-file page speaking the session protocol.

Minimal stand-in for the reference's Dreamverse web app
(/root/reference/apps/dreamverse/): join a session, submit/enhance a
prompt, advance segments, and play the fMP4 stream via MediaSource (with
a plain download fallback when MSE lacks the codec). Served over HTTP by
the same websockets server (server.py process_request hook).
"""

CLIENT_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Dreamverse</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  :root { --bg: #131217; --panel: #1d1c23; --ink: #eceaf2;
          --muted: #9a96a8; --line: #312f3b; --accent: #7f6fe0; }
  * { box-sizing: border-box; }
  body { margin: 0; background: var(--bg); color: var(--ink);
         font: 14px/1.5 system-ui, sans-serif; }
  header { padding: 14px 24px; border-bottom: 1px solid var(--line);
           display: flex; gap: 12px; align-items: baseline; }
  h1 { font-size: 16px; margin: 0; }
  #status { color: var(--muted); font-size: 12px; }
  main { max-width: 900px; margin: 0 auto; padding: 20px;
         display: grid; gap: 14px; }
  video { width: 100%; aspect-ratio: 16 / 9; background: #000;
          border-radius: 8px; border: 1px solid var(--line); }
  .row { display: flex; gap: 8px; }
  input { flex: 1; background: var(--panel); color: var(--ink);
          border: 1px solid var(--line); border-radius: 6px;
          padding: 10px 12px; font: inherit; }
  button { background: var(--accent); color: #14122a; border: 0;
           border-radius: 6px; padding: 10px 16px; font: inherit;
           font-weight: 600; cursor: pointer; }
  button:disabled { opacity: .4; cursor: default; }
  #log { background: var(--panel); border: 1px solid var(--line);
         border-radius: 8px; padding: 10px 12px; font-size: 12px;
         color: var(--muted); max-height: 160px; overflow: auto;
         white-space: pre-wrap; }
</style>
</head>
<body>
<header><h1>Dreamverse</h1><span id="status">connecting…</span></header>
<main>
  <video id="player" controls autoplay muted playsinline></video>
  <div class="row">
    <input id="prompt" placeholder="describe the next moment… (vibe direct)">
    <button id="send" disabled>Direct</button>
    <button id="advance" disabled>Advance</button>
  </div>
  <div id="log"></div>
</main>
<script>
const status = (t) => document.getElementById('status').textContent = t;
const log = (t) => {
  const el = document.getElementById('log');
  el.textContent += t + '\\n'; el.scrollTop = el.scrollHeight;
};
const player = document.getElementById('player');
let ws, sb, mediaSource, queue = [], chunks = [], mime = '';

function pump() {
  if (sb && !sb.updating && queue.length) sb.appendBuffer(queue.shift());
}
function setupMSE(m) {
  mime = m;
  if (!('MediaSource' in window) || !MediaSource.isTypeSupported(m)) {
    log('MediaSource lacks ' + m + ' — falling back to per-segment blobs');
    sb = null; return;
  }
  mediaSource = new MediaSource();
  player.src = URL.createObjectURL(mediaSource);
  mediaSource.addEventListener('sourceopen', () => {
    sb = mediaSource.addSourceBuffer(m);
    sb.addEventListener('updateend', pump);
    pump();
  });
}
function connect() {
  ws = new WebSocket(`ws://${location.host}/`);
  ws.binaryType = 'arraybuffer';
  ws.onopen = () => { status('joining…');
    ws.send(JSON.stringify({type: 'join'})); };
  ws.onclose = () => { status('disconnected'); };
  ws.onmessage = (ev) => {
    if (ev.data instanceof ArrayBuffer) {
      if (sb || mediaSource) { queue.push(ev.data); pump(); }
      else chunks.push(new Uint8Array(ev.data));  // blob-fallback only
      return;
    }
    const msg = JSON.parse(ev.data);
    if (msg.type === 'joined') {
      status(`session ${msg.user_id} · slot ${msg.slot_id}`);
      document.getElementById('send').disabled = false;
      log('joined');
    } else if (msg.type === 'prompt_ready') {
      log(`prompt ready (${msg.source}): ${msg.prompt}`);
      document.getElementById('advance').disabled = false;
    } else if (msg.type === 'media_init') {
      log(`segment ${msg.segment_idx}: ${msg.mime}`);
      if (!mediaSource) setupMSE(msg.mime);
    } else if (msg.type === 'media_chunk') {
      // next binary frame on the socket carries msg.bytes of fMP4
    } else if (msg.type === 'media_complete') {
      log(`segment ${msg.segment_idx} complete (${msg.chunks} chunks)`);
      if (!sb && chunks.length) {  // blob fallback
        player.src = URL.createObjectURL(
          new Blob(chunks, {type: mime || 'video/mp4'}));
        chunks = [];
      }
      document.getElementById('advance').disabled = false;
    } else if (msg.type === 'error') {
      log('error: ' + msg.detail); status('error');
      document.getElementById('advance').disabled = false;
    }
  };
}
document.getElementById('send').onclick = () => {
  const p = document.getElementById('prompt').value.trim();
  if (!p) return;
  log('you: ' + p);
  ws.send(JSON.stringify({type: 'prompt', prompt: p}));
};
document.getElementById('advance').onclick = () => {
  document.getElementById('advance').disabled = true;
  ws.send(JSON.stringify({type: 'advance'}));
};
document.getElementById('prompt').addEventListener('keydown', (e) => {
  if (e.key === 'Enter') document.getElementById('send').click();
});
connect();
</script>
</body>
</html>
"""
